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
