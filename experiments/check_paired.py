"""Oracle check of the paired kernel (runs on whatever backend is default)."""
import numpy as np
import jax
import jax.numpy as jnp

from bitsandbytes_tpu.functional.codebooks import get_4bit_code
from bitsandbytes_tpu.ops.pallas.gemm4bit_paired import (
    gemm_4bit_paired,
    gemm_4bit_paired_nt,
    pack_npaired,
    unpack_npaired,
    repack_2d_to_npaired,
)

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)

for quant_type in ("nf4", "fp4"):
    for (N, K, bs) in ((256, 512, 64), (512, 256, 128), (128, 512, 64)):
        code = get_4bit_code(quant_type, bs)
        q = rng.integers(0, 16, size=(N, K), dtype=np.uint8)
        absmax = (rng.random((N, K // bs)) * 2 + 0.1).astype(np.float32)
        P = pack_npaired(jnp.asarray(q))
        assert np.array_equal(np.asarray(unpack_npaired(P)), q)
        absmax_t = jnp.asarray(absmax.T.copy())

        # oracle: bf16-rounded code units * f32 scale, f32 matmul
        units = code[q].astype(np.float32)
        units_bf = np.asarray(jnp.asarray(units, jnp.bfloat16), np.float32)
        W = units_bf * np.repeat(absmax, bs, axis=1)

        for M in (1, 4, 16):
            A = rng.standard_normal((M, K)).astype(np.float32)
            A_bf = jnp.asarray(A, jnp.bfloat16)
            ref = np.asarray(A_bf, np.float32) @ W.T
            for mode in ("subdot", "element"):
                out = np.asarray(
                    gemm_4bit_paired(
                        A_bf, P, absmax_t, code, bs, (N, K), out_dtype=jnp.float32,
                        scale_mode=mode,
                    )
                )
                err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
                tag = f"{quant_type} N{N} K{K} bs{bs} M{M} {mode}"
                assert err < 2e-2, (tag, err)
                print(f"{tag}: rel err {err:.2e}")

        # nt orientation: G[M, N] @ W -> [M, K]
        G = rng.standard_normal((4, N)).astype(np.float32)
        G_bf = jnp.asarray(G, jnp.bfloat16)
        ref_nt = np.asarray(G_bf, np.float32) @ W
        out_nt = np.asarray(
            gemm_4bit_paired_nt(G_bf, P, absmax_t, code, bs, (N, K), out_dtype=jnp.float32)
        )
        err = np.abs(out_nt - ref_nt).max() / (np.abs(ref_nt).max() + 1e-9)
        assert err < 2e-2, (quant_type, N, K, "nt", err)
        print(f"{quant_type} N{N} K{K} nt: rel err {err:.2e}")

# repack round-trip from the interop 2d layout
q = rng.integers(0, 16, size=(64, 128), dtype=np.uint8)
pairs = q.reshape(64, 64, 2)
p2d = jnp.asarray((pairs[..., 0] << 4) | pairs[..., 1])
Pp = repack_2d_to_npaired(p2d, (64, 128))
assert np.array_equal(np.asarray(unpack_npaired(Pp)), q)
print("repack OK")
print("ALL OK")
