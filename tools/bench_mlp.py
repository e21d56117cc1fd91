"""Dissect the cache-MLP train/infer step cost on the real chip.

VERDICT r2: standalone train measured 19 Msamples/s at B=16384 (0.86 ms/step
~ 97% overhead vs the ~25 us matmul cost). This tool separates:

- per-CALL cost (one jit dispatch per step, the round-2 measurement shape —
  includes the axon tunnel's host->device round trip), vs
- per-STEP device cost (K steps chained inside ONE jit via lax.scan — the
  shape the frame program actually runs, no per-step dispatch), vs
- component costs (encode only, forward only, fused Pallas forward).

Measurement rules for the relayed TPU backend (hard-won, see
.claude/skills/verify): ``jax.block_until_ready`` does NOT reliably block —
every timing ends with a true scalar readback — and identical repeated
dispatches are deduped, so every measured call chains its input on the
previous call's output.

Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    """True completion barrier: scalar readback (tunnel-safe)."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def measure(step, state, reps=20, warmup=3):
    """Time ``state = step(state)`` chains. ``step`` must make each call's
    input depend on the previous output (defeats dispatch dedup)."""
    for _ in range(warmup):
        state = step(state)
    _sync(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(state)
    _sync(state)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--encoding", default="frequency")
    ap.add_argument("--scan-steps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nrc_tpu.config import InputEncoding, NetworkConfig
    from nrc_tpu.models import network as N

    cfg = NetworkConfig(encoding=InputEncoding[args.encoding.upper()])
    ns = N.init_network(jax.random.PRNGKey(0), cfg)
    B = args.batch
    q = jax.random.uniform(jax.random.PRNGKey(1), (B, 15))
    t = jax.random.uniform(jax.random.PRNGKey(2), (B, 3))
    dev = jax.devices()[0]
    out = {"device": f"{dev.platform} {dev.device_kind}", "batch": B,
           "encoding": args.encoding}

    # FLOP accounting for the 64x5 chain (fwd; bwd ~2x more):
    # 2*B*(128*64 + 4*64*64 + 64*16) per forward pass
    flops_fwd = 2 * B * (128 * 64 + (cfg.n_hidden_layers - 1) * 64 * 64 + 64 * 16)
    flops_train = 3 * flops_fwd  # fwd + dgrad + wgrad
    out["gflop_fwd"] = round(flops_fwd / 1e9, 3)
    PEAK = 197e12  # v5e bf16 peak FLOP/s

    # 1. per-call train step (round-2 measurement shape). The network state
    # chains call-to-call (real online-training dataflow).
    step = jax.jit(lambda ns, q, t: N.train_step(ns, q, t, cfg)[0])
    dt = measure(lambda s: step(s, q, t), ns)
    out["train_per_call_ms"] = round(dt * 1e3, 3)
    out["train_per_call_msamples"] = round(B / dt / 1e6, 1)

    # 2. K steps inside ONE jit (device-side step cost, no dispatch)
    K = args.scan_steps

    @jax.jit
    def train_k(ns):
        def body(ns, _):
            ns2, loss = N.train_step(ns, q, t, cfg)
            return ns2, loss
        ns, losses = jax.lax.scan(body, ns, None, length=K)
        return ns

    dt = measure(train_k, ns, reps=10)
    out["train_scanned_ms_per_step"] = round(dt / K * 1e3, 4)
    out["train_scanned_msamples"] = round(B * K / dt / 1e6, 1)
    out["train_mfu_pct"] = round(100.0 * flops_train * K / dt / PEAK, 2)

    # 3. infer per-call and scanned; the query chains on the previous output
    inf = jax.jit(
        lambda ns, q: (N.infer(ns, q, cfg), q)
    )

    def inf_step(state):
        r, q = state
        return inf(ns, q + jnp.max(r) * 1e-30)

    dt = measure(inf_step, (jnp.zeros((B, 3)), q))
    out["infer_per_call_ms"] = round(dt * 1e3, 3)
    out["infer_per_call_msamples"] = round(B / dt / 1e6, 1)

    @jax.jit
    def infer_k(q):
        def body(carry, _):
            r = N.infer(ns, q + carry, cfg)
            return jnp.max(r) * 1e-30, None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return q + carry  # depends on every step

    dt = measure(infer_k, q, reps=10)
    out["infer_scanned_ms_per_step"] = round(dt / K * 1e3, 4)
    out["infer_scanned_msamples"] = round(B * K / dt / 1e6, 1)
    out["infer_mfu_pct"] = round(100.0 * flops_fwd * K / dt / PEAK, 2)

    # 4. encode only (scanned)
    @jax.jit
    def enc_k(q):
        def body(carry, _):
            e = N.encode(q + carry, cfg, ns.grid)
            return jnp.max(e) * 1e-30, None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return q + carry

    dt = measure(enc_k, q, reps=10)
    out["encode_scanned_ms_per_step"] = round(dt / K * 1e3, 4)

    # 5. forward only on pre-encoded input (scanned)
    x = N.encode(q, cfg, ns.grid)

    @jax.jit
    def fwd_k(x):
        def body(carry, _):
            r = N.mlp_forward(ns.ema, x + carry)
            return jnp.max(r) * 1e-30, None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return x + carry

    dt = measure(fwd_k, x, reps=10)
    out["mlpfwd_scanned_ms_per_step"] = round(dt / K * 1e3, 4)
    out["mlpfwd_mfu_pct"] = round(100.0 * flops_fwd * K / dt / PEAK, 2)

    # 6. fused Pallas forward (scanned), TPU only
    if dev.platform == "tpu":
        from nrc_tpu.ops import mlp_pallas as MP

        @jax.jit
        def pfwd_k(x):
            def body(carry, _):
                r = MP.fused_forward(
                    ns.ema.w_in, ns.ema.w_hidden, ns.ema.w_out, x + carry
                )
                return jnp.max(r) * 1e-30, None
            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return x + carry

        dt = measure(pfwd_k, x, reps=10)
        out["pallas_fwd_scanned_ms_per_step"] = round(dt / K * 1e3, 4)
        out["pallas_fwd_mfu_pct"] = round(100.0 * flops_fwd * K / dt / PEAK, 2)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
