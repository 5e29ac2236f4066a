"""Measure per-operation host<->device overheads on the tunneled runtime:
fetch RTT (np.asarray of a READY tiny array), upload cost, dispatch cost.
These set the floor for any host-driven serving loop."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

x = jnp.arange(16, dtype=jnp.int32)
jax.block_until_ready(x)

f = jax.jit(lambda a: a + 1)
y = f(x); jax.block_until_ready(y)

# (a) fetch of a ready array
t0 = time.perf_counter()
for _ in range(20):
    np.asarray(x)
t = (time.perf_counter() - t0) / 20
print(f"fetch ready tiny array: {t*1e3:.2f} ms")

# (b) upload
t0 = time.perf_counter()
for i in range(20):
    arrs = jnp.asarray(np.full(16, i, np.int32))
jax.block_until_ready(arrs)
t = (time.perf_counter() - t0) / 20
print(f"upload tiny array (async dispatch side): {t*1e3:.2f} ms")

# (c) dispatch of a trivial jitted op (async)
t0 = time.perf_counter()
z = x
for _ in range(20):
    z = f(z)
t = (time.perf_counter() - t0) / 20
print(f"dispatch trivial jit (async side): {t*1e3:.2f} ms")
jax.block_until_ready(z)

# (d) dispatch + immediate fetch (full round trip)
t0 = time.perf_counter()
z = x
for _ in range(20):
    z = f(z)
    np.asarray(z)
t = (time.perf_counter() - t0) / 20
print(f"dispatch + fetch round trip: {t*1e3:.2f} ms")

# (e) two dependent fetches vs one combined
a1 = f(x); a2 = f(y); jax.block_until_ready((a1, a2))
t0 = time.perf_counter()
for _ in range(20):
    np.asarray(a1); np.asarray(a2)
t = (time.perf_counter() - t0) / 20
print(f"two separate tiny fetches: {t*1e3:.2f} ms")
t0 = time.perf_counter()
for _ in range(20):
    jax.device_get((a1, a2))
t = (time.perf_counter() - t0) / 20
print(f"device_get pytree of two: {t*1e3:.2f} ms")
