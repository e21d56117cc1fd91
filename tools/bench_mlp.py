"""Dissect the cache-MLP train/infer step cost on the real chip.

VERDICT r2: standalone train measured 19 Msamples/s at B=16384 (0.86 ms/step
~ 97% overhead vs the ~25 us matmul cost). This tool separates:

- per-CALL cost (one jit dispatch per step, the round-2 measurement shape —
  includes the axon tunnel's host->device round trip), vs
- per-STEP device cost (K steps chained inside ONE jit via lax.scan — the
  shape the frame program actually runs, no per-step dispatch), vs
- component costs (encode only, forward only, fused Pallas forward).

Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, *args, reps=50, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
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

    # 1. per-call train step (round-2 measurement shape)
    step = jax.jit(lambda ns, q, t: N.train_step(ns, q, t, cfg))
    dt = measure(lambda: step(ns, q, t))
    out["train_per_call_ms"] = round(dt * 1e3, 3)
    out["train_per_call_msamples"] = round(B / dt / 1e6, 1)

    # 2. K steps inside ONE jit (device-side step cost, no dispatch)
    K = args.scan_steps

    @jax.jit
    def train_k(ns, q, t):
        def body(ns, _):
            ns2, loss = N.train_step(ns, q, t, cfg)
            return ns2, loss
        return jax.lax.scan(body, ns, None, length=K)

    dt = measure(lambda: train_k(ns, q, t), reps=10)
    out["train_scanned_ms_per_step"] = round(dt / K * 1e3, 3)
    out["train_scanned_msamples"] = round(B * K / dt / 1e6, 1)
    out["train_mfu_pct"] = round(
        100.0 * flops_train * K / dt / 197e12, 2
    )  # v5e bf16 peak ~197 TFLOP/s

    # 3. infer per-call and scanned
    inf = jax.jit(lambda ns, q: N.infer(ns, q, cfg))
    dt = measure(lambda: inf(ns, q))
    out["infer_per_call_ms"] = round(dt * 1e3, 3)
    out["infer_per_call_msamples"] = round(B / dt / 1e6, 1)

    @jax.jit
    def infer_k(ns, q):
        def body(acc, _):
            return acc + N.infer(ns, q + acc[0, :15] * 0, cfg).sum() * 0, None
        # chain K independent infers with a fake dependency to defeat CSE
        def body2(carry, _):
            r = N.infer(ns, q + carry, cfg)
            return jnp.max(r) * 1e-30, None
        return jax.lax.scan(body2, jnp.float32(0.0), None, length=K)

    dt = measure(lambda: infer_k(ns, q), reps=10)
    out["infer_scanned_ms_per_step"] = round(dt / K * 1e3, 3)
    out["infer_scanned_msamples"] = round(B * K / dt / 1e6, 1)
    out["infer_mfu_pct"] = round(100.0 * flops_fwd * K / dt / 197e12, 2)

    # 4. encode only (scanned)
    @jax.jit
    def enc_k(q):
        def body(carry, _):
            e = N.encode(q + carry, cfg, ns.grid)
            return jnp.max(e) * 1e-30, None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=K)

    dt = measure(lambda: enc_k(q), reps=10)
    out["encode_scanned_ms_per_step"] = round(dt / K * 1e3, 3)

    # 5. forward only on pre-encoded input (scanned)
    x = N.encode(q, cfg, ns.grid)

    @jax.jit
    def fwd_k(x):
        def body(carry, _):
            r = N.mlp_forward(ns.ema, x + carry)
            return jnp.max(r) * 1e-30, None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=K)

    dt = measure(lambda: fwd_k(x), reps=10)
    out["mlpfwd_scanned_ms_per_step"] = round(dt / K * 1e3, 3)

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
            return jax.lax.scan(body, jnp.float32(0.0), None, length=K)

        dt = measure(lambda: pfwd_k(x), reps=10)
        out["pallas_fwd_scanned_ms_per_step"] = round(dt / K * 1e3, 3)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
