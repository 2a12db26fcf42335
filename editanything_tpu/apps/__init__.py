"""User-facing entry points.

CLI apps mirror the reference scripts (sam2image.py, editany.py,
sketch2image.py, sam2semantic.py, editany_nogradio.py); the Gradio UI
(apps/ui.py `create_demo_template`) builds when gradio is installed and is
import-gated otherwise (this image ships no gradio).
"""

from editanything_tpu.apps.cli import main as cli_main
