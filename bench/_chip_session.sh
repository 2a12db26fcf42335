#!/bin/bash
# Staged on-chip measurement session (run from /root/repo after the tunnel
# is confirmed healthy). Small compiles first so a pathological one is
# identified before the big programs queue behind it. Each stage has its
# own timeout and appends to /tmp/chip_session.log.
set -u
cd /root/repo
LOG=/tmp/chip_session.log
date >> $LOG

stage() {
  name=$1; to=$2; shift 2
  echo "=== $name" >> $LOG
  timeout "$to" "$@" >> $LOG 2>&1
  echo "--- rc=$?" >> $LOG
}

# 0. trivial health check
stage health 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
print('chip ok', float(jnp.sum((x@x).astype(jnp.float32))))"

# 1. conv lowering A/B (tiny compiles)
stage conv_ab 900 python bench/profile_components.py --section conv

# 2. fused resnet probe, small shape (THE risky compile — own process)
stage rn_small 900 python bench/rn_probe.py small

# 3. larger shapes (only meaningful if small passed)
stage rn_mid 900 python bench/rn_probe.py mid
stage rn_up3 900 python bench/rn_probe.py up3
stage rn_up3w 900 python bench/rn_probe.py up3w

# 4. headline bench with the kv-hoisted denoise program (big compile)
stage bench 3000 python bench.py

tail -60 $LOG
