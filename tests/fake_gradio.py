"""Minimal gradio stand-in for headless UI-graph tests.

The deployment image has no gradio; this records the component tree and
event wiring so tests can assert the Blocks graph matches the reference UI
contract (editany_demo.py) and can invoke the handlers directly.
"""

from __future__ import annotations


class _Ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class Component(_Ctx):
    registry = []
    handlers = []

    def __init__(self, *args, **kw):
        self.args = args
        self.kw = kw
        self.label = kw.get("label")
        self.value = kw.get("value")
        Component.registry.append(self)

    def _wire(self, event, fn, inputs, outputs):
        Component.handlers.append(
            {"event": event, "component": self, "fn": fn,
             "inputs": list(inputs or []), "outputs": list(outputs or [])})

    def click(self, fn=None, inputs=None, outputs=None, **kw):
        self._wire("click", fn, inputs, outputs)

    def select(self, fn=None, inputs=None, outputs=None, **kw):
        self._wire("select", fn, inputs, outputs)

    def upload(self, fn=None, inputs=None, outputs=None, **kw):
        self._wire("upload", fn, inputs, outputs)

    @classmethod
    def reset(cls):
        cls.registry = []
        cls.handlers = []


class Blocks(Component):
    pass


class Row(Component):
    pass


class Column(Component):
    pass


class Tab(Component):
    pass


class Tabs(Component):
    pass


class TabItem(Component):
    pass


class Accordion(Component):
    pass


class Image(Component):
    pass


class Radio(Component):
    pass


class Button(Component):
    pass


class Checkbox(Component):
    pass


class Textbox(Component):
    pass


class Slider(Component):
    pass


class Number(Component):
    pass


class Gallery(Component):
    pass


class Markdown(Component):
    pass


class Examples(Component):
    pass


class State(Component):
    def __init__(self, value=None, **kw):
        super().__init__(value=value, **kw)


class SelectData:
    def __init__(self, index=(0, 0)):
        self.index = index
