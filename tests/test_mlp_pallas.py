"""Pallas fused-MLP parity tests (interpret mode on CPU): forward and
backward must match the pure-jnp reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from nrc_tpu.config import NetworkConfig
from nrc_tpu.models import network as N
from nrc_tpu.ops import mlp_pallas as MP


@pytest.fixture()
def setup():
    cfg = NetworkConfig()
    st = N.init_network(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1000, MP.LANE), jnp.float32)
    return cfg, st, x


class TestFusedForward:
    def test_matches_reference(self, setup):
        cfg, st, x = setup
        ref = N.mlp_forward(st.params, x, output_relu=True)
        with pltpu.force_tpu_interpret_mode():
            out = MP.fused_forward(
                st.params.w_in, st.params.w_hidden, st.params.w_out, x,
                output_relu=True,
            )[:, :3]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=1e-2)

    def test_linear_output(self, setup):
        cfg, st, x = setup
        ref = N.mlp_forward(st.params, x, output_relu=False)
        with pltpu.force_tpu_interpret_mode():
            out = MP.fused_forward(
                st.params.w_in, st.params.w_hidden, st.params.w_out, x,
                output_relu=False,
            )[:, :3]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=1e-2)


class TestFusedBackward:
    def test_grads_match_autodiff(self, setup):
        cfg, st, x = setup
        target = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (x.shape[0], 3)))

        def loss_ref(w_in, w_h, w_out):
            pred = N.mlp_forward(
                N.MLPParams(w_in, w_h, w_out), x, output_relu=False
            )
            return N.relative_l2_luminance(pred, target)

        def loss_fused(w_in, w_h, w_out):
            pred = MP.fused_apply(w_in, w_h, w_out, x, False)[:, :3]
            return N.relative_l2_luminance(pred, target)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
            st.params.w_in, st.params.w_hidden, st.params.w_out
        )
        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(
                st.params.w_in, st.params.w_hidden, st.params.w_out
            )
        for a, b, name in zip(g_ref, g_fused, ("w_in", "w_h", "w_out")):
            a, b = np.asarray(a), np.asarray(b)
            denom = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b / denom, a / denom, atol=5e-2, err_msg=name)

    def test_dx_matches_autodiff(self, setup):
        cfg, st, x = setup

        def f_ref(xx):
            return jnp.sum(N.mlp_forward(st.params, xx, output_relu=False) ** 2)

        def f_fused(xx):
            return jnp.sum(
                MP.fused_apply(
                    st.params.w_in, st.params.w_hidden, st.params.w_out, xx, False
                )[:, :3]
                ** 2
            )

        g_ref = np.asarray(jax.grad(f_ref)(x))
        with pltpu.force_tpu_interpret_mode():
            g_fused = np.asarray(jax.grad(f_fused)(x))
        denom = np.abs(g_ref).max() + 1e-8
        np.testing.assert_allclose(g_fused / denom, g_ref / denom, atol=5e-2)


class TestFusedTrainGrad:
    def test_matches_xla_value_and_grad(self):
        """One-kernel fwd+loss+bwd (fused_train_grad) must match the XLA
        path's loss and gradients to bf16-activation tolerance (the kernel
        stores inter-layer activations in bf16; the XLA chain keeps f32)."""
        import jax
        import jax.numpy as jnp
        from nrc_tpu.config import NetworkConfig
        from nrc_tpu.models import network as N
        from nrc_tpu.ops.mlp_pallas import fused_train_grad

        cfg = NetworkConfig()
        st = N.init_network(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        B = 512
        q = jnp.asarray(rng.random((B, 15), np.float32))
        t = jnp.asarray(rng.random((B, 3), np.float32))
        x = N.encode(q, cfg, None)

        def loss_fn(params):
            pred = N.mlp_forward(params, x, output_relu=False)
            return N.relative_l2_luminance(pred, t)

        l_ref, g_ref = jax.value_and_grad(loss_fn)(st.params)
        with pltpu.force_tpu_interpret_mode():
            l_f, dwin, dwh, dwout = fused_train_grad(
                st.params.w_in, st.params.w_hidden, st.params.w_out, x, t
            )
        np.testing.assert_allclose(float(l_f), float(l_ref), rtol=2e-3)
        for a, b in (
            (g_ref.w_in, dwin), (g_ref.w_hidden, dwh), (g_ref.w_out, dwout)
        ):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b / scale, a / scale, atol=5e-3)


class TestFusedTrain4:
    """One-kernel 4-step trainer (round 5, ops/mlp_pallas.py::fused_train4):
    4 sequential Adam+EMA steps with weights/moments resident in VMEM.
    Parity vs 4x network.train_step at reduced tile constants (interpret
    mode); the production-size kernel is exercised by tools/bench_train4.py
    on the chip (measured 72.9 Msamples/s vs the XLA chain's 83 in the
    same harness — ships opt-in, see BASELINE.md round-5 MFU note)."""

    def test_matches_xla_train_steps(self, monkeypatch):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.experimental.pallas import tpu as pltpu

        from nrc_tpu.config import InputEncoding, NetworkConfig
        from nrc_tpu.models import network as N
        from nrc_tpu.ops import mlp_pallas as MP

        monkeypatch.setattr(MP, "HALF", 128)
        monkeypatch.setattr(MP, "TILE_T4", MP.STREAMS * 2 * 128)
        cfg = NetworkConfig(encoding=InputEncoding.FREQUENCY)
        state = N.init_network(jax.random.PRNGKey(0), cfg)
        B = 2 * MP.STREAMS * 2 * 128
        kq, kt = jax.random.split(jax.random.PRNGKey(1))
        q4 = jax.random.uniform(kq, (4, B, 15), jnp.float32)
        t4 = jax.random.uniform(kt, (4, B, 3), jnp.float32) * 2.0
        x4 = jax.vmap(lambda q: N.encode(q, cfg, None))(q4)
        lr = jnp.float32(cfg.learning_rate)

        ref = state
        ref_losses = []
        for k in range(4):
            ref, loss = N.train_step(ref, q4[k], t4[k], cfg,
                                     learning_rate=lr)
            ref_losses.append(float(loss))

        with pltpu.force_tpu_interpret_mode():
            losses, w, mu, nu, ema = MP.fused_train4(
                state.params.w_in, state.params.w_hidden,
                state.params.w_out,
                (state.opt.mu.w_in, state.opt.mu.w_hidden,
                 state.opt.mu.w_out),
                (state.opt.nu.w_in, state.opt.nu.w_hidden,
                 state.opt.nu.w_out),
                (state.ema.w_in, state.ema.w_hidden, state.ema.w_out),
                x4, t4, lr, state.opt.step,
            )
        np.testing.assert_allclose(
            np.asarray(losses), np.asarray(ref_losses), rtol=2e-2
        )
        for a, b in (
            (ref.params.w_in, w[0]), (ref.params.w_hidden, w[1]),
            (ref.params.w_out, w[2]), (ref.ema.w_hidden, ema[1]),
            (ref.opt.mu.w_hidden, mu[1]), (ref.opt.nu.w_hidden, nu[1]),
        ):
            d = float(jnp.max(jnp.abs(a - b)))
            s = float(jnp.max(jnp.abs(a))) or 1.0
            assert d / s < 5e-2, (d, s)
