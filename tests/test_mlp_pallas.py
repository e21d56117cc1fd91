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
