import sys; sys.path.insert(0, "/root/repo")
import os, time

import numpy as np
import typeagent_tpu  # pins platform
import jax, jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices())

# RTT probe
@jax.jit
def f(x): return x + 1
np.asarray(f(jnp.zeros((8,8))))
t0=time.perf_counter()
for _ in range(10): np.asarray(f(jnp.zeros((8,8))))
rtt=(time.perf_counter()-t0)/10*1000
print(f"RTT: {rtt:.1f} ms")

# Upload bandwidth: f32 [20,256,384] = 7.9 MB
for dt, name in [(np.float32,"f32"), (None,"bf16")]:
    a = np.random.default_rng(0).standard_normal((20,256,384)).astype(np.float32)
    if name == "bf16":
        import ml_dtypes
        a = a.astype(ml_dtypes.bfloat16)
    nbytes = a.nbytes
    # warm
    jnp.asarray(a).block_until_ready()
    t0=time.perf_counter()
    for _ in range(5):
        jnp.asarray(a).block_until_ready()
    el=(time.perf_counter()-t0)/5
    print(f"upload {name}: {nbytes/1e6:.1f} MB in {el*1000:.1f} ms -> {nbytes/el/1e6:.0f} MB/s")

# Download bandwidth: fetch 8 MB
big = jnp.zeros((20,256,384), dtype=jnp.float32) + 1
big.block_until_ready()
t0=time.perf_counter()
for _ in range(5):
    np.asarray(big)
el=(time.perf_counter()-t0)/5
print(f"download f32: {big.nbytes/1e6:.1f} MB in {el*1000:.1f} ms -> {big.nbytes/el/1e6:.0f} MB/s")
