"""Optimizer tests: 32-bit vs analytic oracle, 8-bit vs 32-bit agreement.

Mirrors the reference oracle-comparison harness (tests/test_optim.py:27-144):
each bitsandbytes_tpu optimizer runs k steps against an independently-written
numpy reference; 8-bit variants must track the 32-bit trajectory within an
error budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import bitsandbytes_tpu.optim as bnb_optim

K_STEPS = 15


def _np_adam(params, grads_seq, lr=0.01, b1=0.9, b2=0.999, eps=1e-8, wd=0.0):
    p = params.astype(np.float64).copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    for t, g in enumerate(grads_seq, start=1):
        g = g.astype(np.float64)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        c1 = 1 - b1**t
        c2 = np.sqrt(1 - b2**t)
        if wd > 0:
            p *= 1 - lr * wd
        p += -lr * (c2 / c1) * m / (np.sqrt(v) + eps * c2)
    return p


def _np_lion(params, grads_seq, lr=1e-4, b1=0.9, b2=0.99, wd=0.0):
    p = params.astype(np.float64).copy()
    m = np.zeros_like(p)
    for g in grads_seq:
        g = g.astype(np.float64)
        if wd > 0:
            p *= 1 - lr * wd
        p -= lr * np.sign(b1 * m + (1 - b1) * g)
        m = b2 * m + (1 - b2) * g
    return p


def _np_momentum(params, grads_seq, lr=0.01, b1=0.9):
    p = params.astype(np.float64).copy()
    m = np.zeros_like(p)
    for t, g in enumerate(grads_seq, start=1):
        g = g.astype(np.float64)
        m = g if t == 1 else b1 * m + g
        p -= lr * m
    return p


def _np_rmsprop(params, grads_seq, lr=0.01, b1=0.99, eps=1e-8):
    p = params.astype(np.float64).copy()
    v = np.zeros_like(p)
    for g in grads_seq:
        g = g.astype(np.float64)
        v = b1 * v + (1 - b1) * g * g
        p -= lr * g / (np.sqrt(v) + eps)
    return p


def _np_adagrad(params, grads_seq, lr=0.01, eps=1e-10):
    p = params.astype(np.float64).copy()
    v = np.zeros_like(p)
    for g in grads_seq:
        g = g.astype(np.float64)
        v = v + g * g
        p -= lr * g / (np.sqrt(v) + eps)
    return p


def _np_lamb(params, grads_seq, lr=0.01, b1=0.9, b2=0.999, eps=1e-8, wd=0.0,
             max_unorm=1.0):
    """LAMB = Adam rule + max_unorm trust clipping (reference optim/lamb.py;
    clip semantics from backends/default/ops.py:408-423: the update norm is
    evaluated on the BIAS-CORRECTED candidate state, the limit is
    max_unorm * ||p|| with no eps for the adam family)."""
    p = params.astype(np.float64).copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    for t, g in enumerate(grads_seq, start=1):
        g = g.astype(np.float64)
        m_new = b1 * m + (1 - b1) * g
        v_new = b2 * v + (1 - b2) * g * g
        upd = (m_new / (1 - b1**t)) / (np.sqrt(v_new / (1 - b2**t)) + eps)
        unorm = np.sqrt(np.sum(upd * upd))
        limit = max_unorm * np.sqrt(np.sum(p * p))
        scale = limit / unorm if unorm > limit else 1.0
        m, v = m_new, v_new
        c1 = 1 - b1**t
        c2 = np.sqrt(1 - b2**t)
        if wd > 0:
            p *= 1 - lr * wd
        p += scale * (-lr * c2 / c1) * m / (np.sqrt(v) + eps * c2)
    return p


def _np_lars(params, grads_seq, lr=0.01, b1=0.9, wd=0.0, max_unorm=0.02):
    """LARS = momentum rule + max_unorm trust clipping (reference
    optim/lars.py; momentum-family limit carries +eps, here eps=0)."""
    p = params.astype(np.float64).copy()
    m = np.zeros_like(p)
    for t, g in enumerate(grads_seq, start=1):
        g = g.astype(np.float64) + p * wd
        m_new = g if t == 1 else b1 * m + g
        unorm = np.sqrt(np.sum(m_new * m_new))
        limit = max_unorm * np.sqrt(np.sum(p * p))
        scale = limit / unorm if unorm > limit else 1.0
        m = m_new
        p -= scale * lr * m
    return p


def _np_ademamix(params, grads_seq, lr=1e-3, b1=0.9, b2=0.999, b3=0.9999,
                 alpha=5.0, eps=1e-8, wd=0.0, t_alpha=None, t_beta3=None):
    """AdEMAMix double-EMA rule incl. the alpha/beta3 warmup schedulers
    (reference optim/ademamix.py:107-394, scheduler math :200-215)."""
    p = params.astype(np.float64).copy()
    m1 = np.zeros_like(p)
    m2 = np.zeros_like(p)
    v = np.zeros_like(p)
    for t, g in enumerate(grads_seq, start=1):
        g = g.astype(np.float64)
        alpha_t = min(t * alpha / t_alpha, alpha) if t_alpha else alpha
        if t_beta3 and t < t_beta3:
            frac = min(t / t_beta3, 1.0)
            denom = (1 - frac) / np.log(0.9) + frac / np.log(b3)
            b3_t = np.exp(1.0 / denom)
        else:
            b3_t = b3
        m1 = b1 * m1 + (1 - b1) * g
        m2 = b3_t * m2 + (1 - b3_t) * g
        v = b2 * v + (1 - b2) * g * g
        if wd > 0:
            p *= 1 - lr * wd
        mixed = m1 / (1 - b1**t) + alpha_t * m2
        adaptive = np.sqrt(v) / np.sqrt(1 - b2**t) + eps
        p -= lr * mixed / adaptive
    return p


def _run(tx, params, grads_seq):
    state = tx.init(params)
    p = params
    for g in grads_seq:
        updates, state = tx.update(g, state, p)
        p = optax.apply_updates(p, updates)
    return p


def _data(n=4096):
    rng = np.random.RandomState(42)
    params = rng.randn(n).astype(np.float32) * 0.1
    grads = [rng.randn(n).astype(np.float32) * 0.01 for _ in range(K_STEPS)]
    return params, grads


@pytest.mark.parametrize(
    "factory,oracle,kwargs",
    [
        (bnb_optim.adam32bit, _np_adam, dict(learning_rate=0.01)),
        (bnb_optim.adamw32bit, lambda p, g: _np_adam(p, g, lr=0.01, wd=1e-2), dict(learning_rate=0.01)),
        (bnb_optim.lion32bit, _np_lion, dict(learning_rate=1e-4)),
        (bnb_optim.sgd32bit, _np_momentum, dict(learning_rate=0.01, momentum=0.9)),
        (bnb_optim.rmsprop32bit, _np_rmsprop, dict(learning_rate=0.01)),
        (bnb_optim.adagrad32bit, _np_adagrad, dict(learning_rate=0.01)),
    ],
    ids=["adam", "adamw", "lion", "sgd", "rmsprop", "adagrad"],
)
def test_optimizer_32bit_vs_oracle(factory, oracle, kwargs):
    params_np, grads_np = _data()
    tx = factory(**kwargs)
    p = _run(tx, jnp.asarray(params_np), [jnp.asarray(g) for g in grads_np])
    ref = oracle(params_np, grads_np)
    np.testing.assert_allclose(np.asarray(p), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "factory,oracle,kwargs",
    [
        (bnb_optim.lamb, _np_lamb, dict(learning_rate=0.01)),
        (
            bnb_optim.lamb,
            lambda p, g: _np_lamb(p, g, wd=1e-2),
            dict(learning_rate=0.01, weight_decay=1e-2),
        ),
        (bnb_optim.lars, _np_lars, dict(learning_rate=0.01)),
        (bnb_optim.ademamix, _np_ademamix, dict(learning_rate=1e-3)),
        (
            bnb_optim.ademamix,
            lambda p, g: _np_ademamix(p, g, t_alpha=8, t_beta3=8),
            dict(learning_rate=1e-3, t_alpha=8, t_beta3=8),
        ),
    ],
    ids=["lamb", "lamb-wd", "lars", "ademamix", "ademamix-sched"],
)
def test_trust_and_ademamix_32bit_vs_oracle(factory, oracle, kwargs):
    """LAMB / LARS / AdEMAMix k-step trajectories vs hand-written numpy
    oracles (VERDICT r3 item 8; reference tests/test_optim.py:27-144) —
    upgraded from the previous runs-and-is-finite smoke tests.  Gradients
    are scaled so the trust-region clip actually engages on several steps
    (a never-clipping test would not cover max_unorm at all)."""
    rng = np.random.RandomState(7)
    params_np = rng.randn(4096).astype(np.float32) * 0.1
    grads_np = [
        (rng.randn(4096) * (2.0 if t % 3 == 0 else 0.01)).astype(np.float32)
        for t in range(20)
    ]
    tx = factory(**kwargs)
    p = _run(tx, jnp.asarray(params_np), [jnp.asarray(g) for g in grads_np])
    ref = oracle(params_np, grads_np)
    np.testing.assert_allclose(np.asarray(p), ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "name",
    ["adam", "adamw", "lion", "sgd", "rmsprop", "adagrad"],
)
def test_optimizer_8bit_tracks_32bit(name):
    """8-bit state optimizers stay close to the 32-bit trajectory (reference
    tests/test_optim.py:387+ error-budget pattern)."""
    params_np, grads_np = _data(8192)
    kwargs = dict(momentum=0.9) if name == "sgd" else {}
    lr = 1e-4 if name == "lion" else 0.01
    tx32 = getattr(bnb_optim, f"{name}32bit")(learning_rate=lr, **kwargs)
    tx8 = getattr(bnb_optim, f"{name}8bit")(learning_rate=lr, **kwargs)
    p32 = _run(tx32, jnp.asarray(params_np), [jnp.asarray(g) for g in grads_np])
    p8 = _run(tx8, jnp.asarray(params_np), [jnp.asarray(g) for g in grads_np])
    diff = np.abs(np.asarray(p32) - np.asarray(p8))
    # error budget: a small fraction may exceed the tight tolerance
    frac_bad = (diff > 1e-2).mean()
    assert frac_bad < 0.002, (frac_bad, diff.max())
    assert diff.mean() < 2e-3


@pytest.mark.parametrize("name", ["lamb", "lars", "ademamix"])
def test_trust_and_ademamix_8bit_tracks_32bit(name):
    """8-bit LAMB / LARS / AdEMAMix trajectories track their 32-bit
    counterparts within the reference error-count budget (VERDICT r3
    item 8: every 8-bit family gets a trajectory test)."""
    params_np, grads_np = _data(8192)
    lr = 1e-3 if name == "ademamix" else 0.01
    tx32 = getattr(bnb_optim, f"{name}32bit")(learning_rate=lr)
    tx8 = getattr(bnb_optim, f"{name}8bit")(learning_rate=lr)
    p32 = _run(tx32, jnp.asarray(params_np), [jnp.asarray(g) for g in grads_np])
    p8 = _run(tx8, jnp.asarray(params_np), [jnp.asarray(g) for g in grads_np])
    diff = np.abs(np.asarray(p32) - np.asarray(p8))
    frac_bad = (diff > 1e-2).mean()
    assert frac_bad < 0.002, (frac_bad, diff.max())
    assert diff.mean() < 2e-3


def test_8bit_small_param_uses_32bit_state():
    """Params under min_8bit_size keep fp32 state (reference
    optim/optimizer.py:429-432)."""
    tx = bnb_optim.adam8bit(min_8bit_size=4096)
    params = {"small": jnp.zeros(100), "big": jnp.zeros(5000)}
    state = tx.init(params)
    assert state.leaves["small"]["state1"].dtype == jnp.float32
    assert state.leaves["big"]["state1"].dtype == jnp.uint8
    assert state.leaves["big"]["absmax1"].shape == (-(-5000 // 256),)


def test_ademamix_runs():
    params_np, grads_np = _data(4096)
    for bits in (32, 8):
        tx = bnb_optim.ademamix(learning_rate=1e-3, optim_bits=bits)
        p = _run(tx, jnp.asarray(params_np), [jnp.asarray(g) for g in grads_np])
        assert np.isfinite(np.asarray(p)).all()
        # ademamix uses two EMAs in state1
        state = tx.init(jnp.asarray(params_np))
        assert state.leaves["state1"].shape[0] == 2


def test_lamb_lars_run():
    params_np, grads_np = _data(512)
    for f in (bnb_optim.lamb, bnb_optim.lars):
        tx = f(learning_rate=0.01)
        p = _run(tx, jnp.asarray(params_np), [jnp.asarray(g) for g in grads_np])
        assert np.isfinite(np.asarray(p)).all()
        assert not np.allclose(np.asarray(p), params_np)


def test_8bit_nonfinite_grad_skips_update():
    """NaN/Inf gradients leave the param unchanged (kernels.cu:1017)."""
    params = jnp.ones(4096)
    tx = bnb_optim.adam8bit(learning_rate=0.1)
    state = tx.init(params)
    g = jnp.ones(4096).at[7].set(jnp.nan).at[13].set(jnp.inf)
    updates, state = tx.update(g, state, params)
    u = np.asarray(updates)
    assert u[7] == 0.0 and u[13] == 0.0
    assert (u[np.arange(4096) % 4096 != 7] != 0).sum() > 4000


def test_paged_states_stay_on_host():
    """Paged states must remain host-resident ACROSS steps (VERDICT r2
    item 5): `init` pins to pinned_host and every eager `update` re-pins the
    new states — not just step 1."""
    from bitsandbytes_tpu.optim.paged import host_memory_supported

    if not host_memory_supported():
        pytest.skip("backend has no pinned_host memory space")
    params = {"w": jnp.ones((64, 128)), "b": jnp.zeros(8192)}
    tx = bnb_optim.paged_adamw8bit(learning_rate=0.01)
    state = tx.init(params)

    def kinds(s):
        return {
            getattr(x.sharding, "memory_kind", None)
            for x in jax.tree_util.tree_leaves(s.leaves)
            if isinstance(x, jax.Array)
        }

    assert kinds(state) == {"pinned_host"}
    g = {"w": jnp.ones((64, 128)) * 0.1, "b": jnp.ones(8192) * 0.1}
    for _ in range(3):
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    assert kinds(state) == {"pinned_host"}, "states migrated off host"
    # non-paged optimizers stay device-resident (no accidental host pinning)
    tx2 = bnb_optim.adamw8bit(learning_rate=0.01)
    s2 = tx2.init(params)
    _, s2 = tx2.update(g, s2, params)
    assert "pinned_host" not in kinds(s2)


def test_optimizer_under_jit_scan():
    """The whole optimizer step jits and scans (TPU training-loop shape).
    Non-paged: host-pinned states now REALLY pin (they no-op'd before), and
    carrying pinned leaves through a plain jit(scan) is unsupported on the
    CPU backend — paged jit flows go through optim.make_paged_update."""
    params = {"w": jnp.ones((64, 64)), "b": jnp.zeros(64)}
    tx = bnb_optim.adamw8bit(learning_rate=0.01)
    state = tx.init(params)

    g = {"w": jnp.ones((64, 64)) * 0.1, "b": jnp.ones(64) * 0.1}

    @jax.jit
    def step(carry, _):
        p, s = carry
        updates, s = tx.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), ()

    (p, s), _ = jax.lax.scan(step, (params, state), None, length=3)
    assert np.isfinite(np.asarray(p["w"])).all()
    assert int(s.step) == 3


def test_pallas_8bit_kernel_matches_oracle():
    """The fused Pallas 8-bit optimizer kernel (interpret mode on CPU) is
    bit-exact vs the jnp oracle for the uint8 states and within 1 ulp for
    params (SURVEY.md §4 oracle pattern)."""
    import numpy as np
    from bitsandbytes_tpu.functional.optim_update import _optimizer_update_8bit_jnp
    from bitsandbytes_tpu.ops.pallas.optim8bit import optimizer_update_8bit_pallas
    from bitsandbytes_tpu.functional.codebooks import create_dynamic_map
    from bitsandbytes_tpu.functional.blockwise import quantize_blockwise_with_code

    qmap1 = jnp.asarray(create_dynamic_map(True))
    qmap2 = jnp.asarray(create_dynamic_map(False))
    n = 2048 + 100  # exercises padding
    p = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32) * 0.01
    g = g.at[7].set(jnp.nan)  # NaN-skip semantics (kernels.cu:1017)
    m = jax.random.normal(jax.random.PRNGKey(2), (n,)) * 0.01
    v = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (n,))) * 1e-4
    s1, am1 = quantize_blockwise_with_code(m, qmap1, 256)
    s2, am2 = quantize_blockwise_with_code(v, qmap2, 256)

    kw = dict(beta1=0.9, beta2=0.999, eps=1e-8, weight_decay=1e-2, step=3, lr=1e-3)
    ref = _optimizer_update_8bit_jnp("adam", g, p, s1, s2, qmap1, qmap2, am1, am2, **kw)
    out = optimizer_update_8bit_pallas("adam", g, p, s1, s2, qmap1, qmap2, am1, am2, **kw)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(out[0]), atol=3e-7)
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(out[2]))

    kwl = dict(beta1=0.9, beta2=0.99, eps=0.0, weight_decay=0.0, step=1, lr=1e-4)
    refl = _optimizer_update_8bit_jnp("lion", g, p, s1, None, qmap1, None, am1, None, **kwl)
    outl = optimizer_update_8bit_pallas("lion", g, p, s1, None, qmap1, None, am1, None, **kwl)
    np.testing.assert_allclose(np.asarray(refl[0]), np.asarray(outl[0]), atol=3e-7)
    np.testing.assert_array_equal(np.asarray(refl[1]), np.asarray(outl[1]))


def test_pallas_8bit_ademamix_matches_oracle():
    import numpy as np
    from bitsandbytes_tpu.functional.optim_update import _optimizer_update_8bit_jnp
    from bitsandbytes_tpu.ops.pallas.optim8bit import optimizer_update_8bit_pallas
    from bitsandbytes_tpu.functional.codebooks import create_dynamic_map
    from bitsandbytes_tpu.functional.blockwise import quantize_blockwise_with_code

    qmap1 = jnp.asarray(create_dynamic_map(True))
    qmap2 = jnp.asarray(create_dynamic_map(False))
    n = 1024 + 60
    p = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32) * 0.01
    m1 = jax.random.normal(jax.random.PRNGKey(2), (n,)) * 0.01
    m2 = jax.random.normal(jax.random.PRNGKey(3), (n,)) * 0.01
    v = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (n,))) * 1e-4
    q1a, am1a = quantize_blockwise_with_code(m1, qmap1, 256)
    q1b, am1b = quantize_blockwise_with_code(m2, qmap1, 256)
    s1 = jnp.stack([q1a, q1b])
    am1 = jnp.stack([am1a, am1b])
    s2, am2 = quantize_blockwise_with_code(v, qmap2, 256)

    kw = dict(
        beta1=0.9, beta2=0.999, beta3=0.9999, alpha=5.0,
        eps=1e-8, weight_decay=1e-2, step=4, lr=1e-3,
    )
    ref = _optimizer_update_8bit_jnp("ademamix", g, p, s1, s2, qmap1, qmap2, am1, am2, **kw)
    out = optimizer_update_8bit_pallas("ademamix", g, p, s1, s2, qmap1, qmap2, am1, am2, **kw)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(out[0]), atol=3e-7)
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(out[2]))


def test_pallas_8bit_padding_matches_oracle_over_steps():
    """Non-multiple-of-256 params: the kernel's state-code padding must not
    create ghost elements that drift the last block's absmax from the
    oracle over repeated steps."""
    import numpy as np
    from bitsandbytes_tpu.functional.optim_update import _optimizer_update_8bit_jnp
    from bitsandbytes_tpu.ops.pallas.optim8bit import optimizer_update_8bit_pallas
    from bitsandbytes_tpu.functional.codebooks import create_dynamic_map
    from bitsandbytes_tpu.functional.blockwise import quantize_blockwise_with_code

    qmap1 = jnp.asarray(create_dynamic_map(True))
    qmap2 = jnp.asarray(create_dynamic_map(False))
    n = 300  # 44 pad elements in the last block
    rng = np.random.default_rng(0)
    p_j = p_p = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    s1_j = s1_p = jnp.zeros(n, jnp.uint8)
    s2_j = s2_p = jnp.zeros(n, jnp.uint8)
    am1_j = am1_p = jnp.zeros(2, jnp.float32)
    am2_j = am2_p = jnp.zeros(2, jnp.float32)
    kw = dict(beta1=0.9, beta2=0.999, eps=1e-8, weight_decay=0.0, lr=1e-3)
    for step in range(1, 9):
        # shrinking gradients expose ghost-element absmax inflation
        g = jnp.asarray((rng.normal(size=(n,)) * 0.01 / step).astype(np.float32))
        p_j, s1_j, s2_j, am1_j, am2_j = _optimizer_update_8bit_jnp(
            "adam", g, p_j, s1_j, s2_j, qmap1, qmap2, am1_j, am2_j, step=step, **kw
        )
        p_p, s1_p, s2_p, am1_p, am2_p = optimizer_update_8bit_pallas(
            "adam", g, p_p, s1_p, s2_p, qmap1, qmap2, am1_p, am2_p, step=step, **kw
        )
    # bias corrections differ by 1 ulp (exp(step*log b) vs b**step), which
    # can cross a quantization midpoint on rare ties: budget <= 1% codes off
    # by one (reference-style error-count budget); absmax must track tightly
    # (the ghost-element bug inflated it by ~2e-3 within 4 steps).
    for s_j, s_p in ((s1_j, s1_p), (s2_j, s2_p)):
        d = np.abs(np.asarray(s_j, np.int32) - np.asarray(s_p, np.int32))
        assert d.max() <= 1 and (d > 0).mean() <= 0.01, (d.max(), (d > 0).mean())
    np.testing.assert_allclose(np.asarray(am1_j), np.asarray(am1_p), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_j), np.asarray(p_p), atol=1e-6)


def test_lamb8bit_trust_clipping_active():
    """max_unorm (LAMB/LARS trust clipping) must apply on the 8-bit path:
    under exploding gradients the LAMB update norm is bounded relative to
    the param norm, unlike plain Adam8bit."""
    import optax
    from bitsandbytes_tpu import optim

    n = 8192
    p = {"w": jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)}
    g = {"w": 100.0 * jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)}

    def step_norm(opt):
        st = opt.init(p)
        u, _ = opt.update(g, st, p)
        return float(jnp.linalg.norm(u["w"]))

    lamb = step_norm(optim.lamb8bit(1.0, max_unorm=0.1))  # tight trust region
    adam = step_norm(optim.adam8bit(1.0))
    pnorm = float(jnp.linalg.norm(p["w"]))
    assert lamb < adam * 0.5, (lamb, adam)
    assert lamb <= 0.1 * pnorm * 1.2  # max_unorm bound (+slack)


def test_sign_preservation_fixup():
    """Reference kernels.cu:1118-1133: when the requantized signed state's
    slot sign differs from the true value's sign, the code is bumped +/-1
    toward the correct sign.  Tiny negative values that would round to the
    +0.0 slot must land on the first negative code instead."""
    from bitsandbytes_tpu.functional.codebooks import create_dynamic_map
    from bitsandbytes_tpu.functional.optim_update import state_requant_blocks
    from bitsandbytes_tpu.functional.dynamic_segments import build_segments

    code = np.asarray(create_dynamic_map(signed=True), np.float32)
    table = build_segments(code)
    assert table is not None and table.signed
    zero_idx = int(np.abs(code).argmin())

    # one block: a large anchor (sets absmax) + tiny +/- values that fall
    # inside the zero bucket after scaling
    x = np.zeros((1, 256), np.float32)
    x[0, 0] = 1.0
    x[0, 1] = 1e-9   # +tiny -> zero slot, sign matches (+0.0) -> no bump
    x[0, 2] = -1e-9  # -tiny -> zero slot, signbit differs -> bump to code-1
    x[0, 3] = -0.0   # signbit(-0.0)=1 -> bump (faithful to CUDA signbit)
    xj = jnp.asarray(x)

    q_fix, _ = state_requant_blocks(xj, table, None, True)
    q_nofix, _ = state_requant_blocks(xj, table, None, False)
    q_fix, q_nofix = np.asarray(q_fix), np.asarray(q_nofix)

    assert q_nofix[0, 1] == zero_idx and q_nofix[0, 2] == zero_idx
    assert q_fix[0, 1] == zero_idx          # positive tiny: no bump
    assert q_fix[0, 2] == zero_idx - 1      # negative tiny: bumped
    assert q_fix[0, 3] == zero_idx - 1      # -0.0: signbit mismatch
    # decoded signs now match the true signs
    assert code[q_fix[0, 2]] < 0

    # unsigned map: fixup is a no-op (reference: "not needed for state2")
    ucode = np.asarray(create_dynamic_map(signed=False), np.float32)
    utable = build_segments(ucode)
    xu = np.abs(x)
    qu_fix, _ = state_requant_blocks(jnp.asarray(xu), utable, None, True)
    qu_nofix, _ = state_requant_blocks(jnp.asarray(xu), utable, None, False)
    np.testing.assert_array_equal(np.asarray(qu_fix), np.asarray(qu_nofix))


@pytest.mark.parametrize("name", ["adam", "lion", "ademamix"])
@pytest.mark.parametrize("n", [256 * 16, 2048 + 100, 4096 * 3 + 17])
def test_seg_tile4k_layout_bit_identical_to_2d(name, n):
    """The tile4k internal layout (bitcast-true (n/4096, 32, 128) blocked
    view — no physical relayout of any big operand, see PARITY.md Round-5
    closures) must be BIT-identical to the historical (NB, 256) form on
    every output: the elementwise values are unchanged and the per-block
    max reduce is order-independent.  Covers whole-tile, sub-tile-padded,
    and multi-tile-padded sizes."""
    import numpy as np
    from bitsandbytes_tpu.functional.codebooks import create_dynamic_map
    from bitsandbytes_tpu.functional.blockwise import quantize_blockwise_with_code
    from bitsandbytes_tpu.functional.optim_update import _optimizer_update_8bit_seg

    qmap1 = jnp.asarray(create_dynamic_map(True))
    qmap2 = jnp.asarray(create_dynamic_map(False))
    code1 = tuple(float(x) for x in np.asarray(qmap1))
    code2 = tuple(float(x) for x in np.asarray(qmap2))
    p = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32) * 0.01
    g = g.at[3].set(jnp.inf)  # nonfinite-skip path must match too
    m = jax.random.normal(jax.random.PRNGKey(2), (n,)) * 0.01
    v = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (n,))) * 1e-4
    s1, am1 = quantize_blockwise_with_code(m, qmap1, 256)
    s2, am2 = quantize_blockwise_with_code(v, qmap2, 256)
    if name == "ademamix":
        s1 = jnp.stack([s1, s1])
        am1 = jnp.stack([am1, am1])
        kw = dict(beta1=0.9, beta2=0.999, beta3=0.9999, alpha=5.0,
                  eps=1e-8, step=4, lr=1e-3)
    elif name == "lion":
        s2 = am2 = None
        kw = dict(beta1=0.9, beta2=0.99, eps=0.0, step=4, lr=1e-4)
    else:
        kw = dict(beta1=0.9, beta2=0.999, eps=1e-8, weight_decay=1e-2,
                  step=4, lr=1e-3)
    c2 = code2 if s2 is not None else None
    outs = {}
    for layout in ("2d", "tile4k"):
        outs[layout] = _optimizer_update_8bit_seg(
            name, g, p, s1, s2, am1, am2,
            code1_t=code1, code2_t=c2, fixup=True, layout=layout, **kw,
        )
    for a, b, nm in zip(outs["2d"], outs["tile4k"], ("p", "s1", "s2", "am1", "am2")):
        if a is None:
            assert b is None
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=nm)
