#!/bin/bash
# Probe the tunneled TPU with a tiny jit; log result. Used to detect tunnel recovery.
out=$(timeout 60 python -c "
import jax, jax.numpy as jnp, time
t0=time.time()
x = jax.jit(lambda a: (a*2+1).sum())(jnp.ones((128,128)))
print('ok', float(x), round(time.time()-t0,1))" 2>&1 | grep -v WARNING | tail -1)
echo "$(date +%H:%M:%S) $out" >> /root/repo/experiments/tpu_probe.log
