"""Diagnostics CLI: ``python -m bitsandbytes_tpu``.

TPU-native analog of the reference's diagnostics entry point
(bitsandbytes/__main__.py:1-4, diagnostics/main.py:27-134): prints the
runtime environment and runs a live sanity check — one real quantize
round-trip and one 8-bit Adam step — so users can verify their install
before filing issues.
"""

from __future__ import annotations

import platform
import sys
import traceback

__all__ = ["main", "sanity_check"]


def _print_header(title: str) -> None:
    print("+" + "-" * 62 + "+")
    print(f"| {title:<60} |")
    print("+" + "-" * 62 + "+")


def print_environment() -> None:
    import jax

    _print_header("bitsandbytes_tpu environment")
    import bitsandbytes_tpu as bnb

    print(f"bitsandbytes_tpu: {bnb.__version__}")
    print(f"python:           {sys.version.split()[0]} ({platform.platform()})")
    print(f"jax:              {jax.__version__}")
    print(f"backend:          {jax.default_backend()}")
    for d in jax.devices():
        print(f"device:           {d}")
    try:
        import flax

        print(f"flax:             {flax.__version__}")
    except Exception:
        print("flax:             (not available)")
    try:
        import optax

        print(f"optax:            {optax.__version__}")
    except Exception:
        print("optax:            (not available)")
    from bitsandbytes_tpu.ops import dispatch

    print(f"kernel backend:   {dispatch.backend()} (pallas={dispatch.use_pallas()})")


def sanity_check() -> None:
    """Quantize round-trip + one 8-bit Adam step on the default device
    (reference diagnostics/main.py:27-39 runs exactly one Adam step)."""
    import jax
    import jax.numpy as jnp

    import bitsandbytes_tpu as bnb
    from bitsandbytes_tpu import optim

    # quantize round-trip
    x = jax.random.normal(jax.random.PRNGKey(0), (256, 256), jnp.float32)
    packed, state = bnb.functional.quantize_4bit(x, blocksize=64, quant_type="nf4")
    x_dq = bnb.functional.dequantize_4bit(packed, quant_state=state)
    err = float(jnp.abs(x - x_dq).mean())
    assert err < 0.1, f"NF4 round-trip error too large: {err}"
    print(f"quantize_4bit round-trip: OK (mean abs err {err:.4f})")

    # one 8-bit Adam step
    p = {"w": jax.random.normal(jax.random.PRNGKey(1), (64, 4096), jnp.float32)}
    g = jax.tree_util.tree_map(lambda t: t * 0.01, p)
    opt = optim.adam8bit(1e-3)
    st = opt.init(p)
    updates, st = opt.update(g, st, p)
    import optax

    p2 = optax.apply_updates(p, updates)
    delta = float(jnp.abs(p2["w"] - p["w"]).max())
    assert 0 < delta < 1.0, f"Adam step moved params by {delta}"
    print(f"Adam8bit step:            OK (max |dp| {delta:.2e})")

    # fused matmul vs oracle
    A = jax.random.normal(jax.random.PRNGKey(2), (8, 256)).astype(jnp.bfloat16)
    out = bnb.matmul_4bit(A, packed, state)
    ref = jnp.dot(A.astype(jnp.float32), x_dq.T)
    rel = float(jnp.abs(out.astype(jnp.float32) - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert rel < 0.05, f"matmul_4bit relative error {rel}"
    print(f"matmul_4bit vs oracle:    OK (rel err {rel:.2e})")


def main() -> int:
    print_environment()
    print()
    _print_header("sanity check")
    try:
        sanity_check()
    except Exception:
        traceback.print_exc()
        print("\nSanity check FAILED — see traceback above.")
        return 1
    print("\nInstallation looks healthy.")
    return 0
