"""Fused 4-step trainer (ops/mlp_pallas.py::fused_train4) vs the XLA chain.

--check: interpret-mode (CPU) / compiled numeric parity vs 4x
  network.train_step on identical data (frequency path, linear output).
--bench: in-program throughput of the full 4x16384 per-frame train side,
  XLA chain vs fused kernel, chained over --inner frames in one jit.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def build_state(key):
    from nrc_tpu.config import InputEncoding, NetworkConfig
    from nrc_tpu.models import network as N

    cfg = NetworkConfig(encoding=InputEncoding.FREQUENCY)
    state = N.init_network(key, cfg)
    return cfg, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nrc_tpu.models import network as N
    from nrc_tpu.ops import mlp_pallas as MP

    cfg, state = build_state(jax.random.PRNGKey(0))
    B = args.batch
    key = jax.random.PRNGKey(1)
    kq, kt = jax.random.split(key)
    q4 = jax.random.uniform(kq, (4, B, 15), jnp.float32)
    t4 = jax.random.uniform(kt, (4, B, 3), jnp.float32) * 2.0

    x4 = jax.vmap(lambda q: N.encode(q, cfg, None))(q4)
    lr = jnp.float32(cfg.learning_rate)

    def xla_4steps(state, q4, t4):
        losses = []
        for k in range(4):
            state, loss = N.train_step(state, q4[k], t4[k], cfg,
                                       learning_rate=lr)
            losses.append(loss)
        return state, jnp.stack(losses)

    def fused_4steps(state, q_or_x, t4, encoded=True):
        x4 = q_or_x if encoded else jax.vmap(
            lambda q: N.encode(q, cfg, None))(q_or_x)
        p, o, e = state.params, state.opt, state.ema
        losses, w, mu, nu, ema = MP.fused_train4(
            p.w_in, p.w_hidden, p.w_out,
            (o.mu.w_in, o.mu.w_hidden, o.mu.w_out),
            (o.nu.w_in, o.nu.w_hidden, o.nu.w_out),
            (e.w_in, e.w_hidden, e.w_out),
            x4, t4, lr, o.step,
        )
        params = N.MLPParams(w_in=w[0], w_hidden=w[1], w_out=w[2])
        new = N.NetworkState(
            params=params,
            ema=N.MLPParams(w_in=ema[0], w_hidden=ema[1], w_out=ema[2]),
            opt=N.AdamState(
                mu=N.MLPParams(*mu), nu=N.MLPParams(*nu),
                step=o.step + 4, mu_grid=o.mu_grid, nu_grid=o.nu_grid,
            ),
            grid=state.grid, ema_grid=state.ema_grid,
        )
        return new, losses

    if args.check:
        from jax.experimental.pallas import tpu as pltpu

        ref_state, ref_losses = jax.jit(xla_4steps)(state, q4, t4)
        if args.interpret:
            with pltpu.force_tpu_interpret_mode():
                new_state, losses = fused_4steps(state, x4, t4)
        else:
            new_state, losses = jax.jit(fused_4steps)(state, x4, t4)
        import numpy as np

        print("losses xla  :", np.asarray(ref_losses))
        print("losses fused:", np.asarray(losses))
        worst = 0.0
        for name, a, b in (
            ("w_in", ref_state.params.w_in, new_state.params.w_in),
            ("w_h", ref_state.params.w_hidden, new_state.params.w_hidden),
            ("w_out", ref_state.params.w_out, new_state.params.w_out),
            ("ema_h", ref_state.ema.w_hidden, new_state.ema.w_hidden),
            ("mu_h", ref_state.opt.mu.w_hidden, new_state.opt.mu.w_hidden),
            ("nu_h", ref_state.opt.nu.w_hidden, new_state.opt.nu.w_hidden),
        ):
            d = float(jnp.max(jnp.abs(a - b)))
            s = float(jnp.max(jnp.abs(a)))
            rel = d / max(s, 1e-12)
            worst = max(worst, rel)
            print(f"  {name}: max|d|={d:.3e} rel={rel:.3e}")
        lrel = float(jnp.max(jnp.abs(ref_losses - losses))) / max(
            float(jnp.max(ref_losses)), 1e-12)
        print(f"loss rel err {lrel:.3e}; worst param rel {worst:.3e}")
        ok = worst < 5e-2 and lrel < 5e-3
        print("PARITY OK" if ok else "PARITY FAIL")
        if not ok:
            sys.exit(1)

    if args.bench:
        def chain(fn, state, x_or_q):
            def body(i, st):
                st2, losses = fn(st, x_or_q, t4)
                # data dependence so iterations cannot collapse
                return st2
            return jax.lax.fori_loop(0, args.inner, body, state)

        res = {"batch": B, "inner": args.inner}
        for name, fn, arg in (
            ("xla", xla_4steps, q4),
            # fair comparison: the fused path pays its encode per frame too
            ("fused", lambda st, q, t: fused_4steps(st, q, t, encoded=False),
             q4),
        ):
            run = jax.jit(lambda st, a=arg, f=fn: chain(f, st, a))
            st = run(state)
            float(jnp.ravel(st.params.w_in)[0])
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                st = run(st)
                float(jnp.ravel(st.params.w_in)[0])
                times.append(time.perf_counter() - t0)
            times.sort()
            dt = times[len(times) // 2] / args.inner
            msamp = 4 * B / dt / 1e6
            res[f"{name}_ms_per_frame_trainside"] = round(dt * 1e3, 3)
            res[f"{name}_msamples_per_s"] = round(msamp, 1)
            print(f"{name}: {dt*1e3:.3f} ms / 4-step frame, "
                  f"{msamp:.1f} Msamples/s", file=sys.stderr, flush=True)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
