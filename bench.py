"""Benchmark: Cornell NRC frame loop on one chip -> one JSON line.

Mirrors the reference's benchmark mode (``Application::benchmark``,
``nrc/src/Application.cpp:496-540``: async frame loop, sync, fps print) on
the Cornell scene at its shipped 320x320 resolution, FULL render mode with
online training enabled — the complete per-frame NRC pipeline (render +
train wavefronts, cache inference, propagation, shuffle, 4 Adam steps).

Prints exactly one JSON line:
  {"metric": "mrays_per_s", "value": N, "unit": "Mrays/s", "vs_baseline": R}

The reference publishes no benchmark numbers (BASELINE.md); vs_baseline is
measured against a recorded first-run value in bench_baseline.json when
present, else 1.0.
"""

import json
import os
import sys
import threading
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


LAST_GOOD = os.path.join(os.path.dirname(__file__), "bench_last.json")


def _stale_payload(note: str) -> dict:
    """Last good on-hardware result (marked stale), or a zero placeholder.
    The bench must ALWAYS print one parseable JSON line — the reference's
    benchmark mode likewise always reports (``Application::benchmark``,
    ``Application.cpp:496-540``)."""
    payload = {
        "metric": "mrays_per_s", "value": 0.0, "unit": "Mrays/s",
        "vs_baseline": 0.0, "stale": True,
        "note": note + "; no cached result",
    }
    try:
        with open(LAST_GOOD) as f:
            payload = json.load(f)
        payload["stale"] = True
        payload["note"] = note + "; last good measured result"
    except Exception:
        pass
    return payload


def _watchdog(seconds: float):
    """The remote-TPU tunnel can die and hang RPCs indefinitely. If the
    bench does not finish in time, emit the last good on-hardware result
    (marked stale) instead of producing nothing, then hard-exit (the stuck
    RPC cannot be interrupted)."""

    def fire():
        print(json.dumps(_stale_payload("TPU unreachable (hang)")), flush=True)
        log(f"bench watchdog fired after {seconds}s — TPU tunnel presumed dead")
        os._exit(0)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    wd = _watchdog(float(os.environ.get("BENCH_WATCHDOG_S", "2400")))
    import jax
    import jax.numpy as jnp

    from nrc_tpu.config import RenderMode
    from nrc_tpu.render.renderer import Renderer
    from nrc_tpu.scene.scene_builder import load_scene

    scene, system = load_scene(
        "/root/reference/data/system_mdl_cornell.txt",
        "/root/reference/data/scene_mdl_cornell.txt",
    )
    # reference-shipped Cornell config: 320x320, pathLengths 2..6
    system.tile_size = (4, 4)  # steady-state adapted size (~80% record fill)
    r = Renderer(
        scene,
        system,
        render_mode=RenderMode.FULL,
        train=True,
        adaptive_tiles=False,
    )
    dev = jax.devices()[0]
    log(f"bench device: {dev.platform} {dev.device_kind}")

    # warmup: compile + a few steady-state frames (scalar readback = true
    # completion barrier, see below)
    for _ in range(3):
        r.render_frame()
    float(jnp.ravel(r.image)[0])

    spp = int(os.environ.get("BENCH_SPP", "32"))
    reps = int(os.environ.get("BENCH_REPS", "5"))

    # Drift-proof timing: the relayed TPU tunnel adds a per-DISPATCH
    # round-trip whose latency drifts 15-18% day-to-day (BASELINE.md
    # "headline run-to-run variance"); a host loop of 32 single-frame
    # dispatches soaks that up and made identical builds measure 2.8 vs 3.8
    # Mrays/s on different days. Instead the whole spp-frame loop runs as
    # ONE jitted lax.scan dispatch (one round-trip amortized over ~2 s of
    # device work, <1%), and the reported value is the median of BENCH_REPS
    # timed reps within this session.
    import functools

    from nrc_tpu.render.frame import frame_step

    step = functools.partial(
        frame_step,
        cfg=r.cfg,
        net_cfg=r.net_cfg,
        train_unbiased_ratio=r.cfg.train_unbiased_ratio,
    )

    def loop(scene, state, image, cam, it0, sub0, lr):
        def body(carry, _):
            image, state, it, sub = carry
            image, state, stats = step(
                scene, state, image, cam, it, sub, learning_rate=lr
            )
            carry = (image, state, it + jnp.int32(1), sub + jnp.uint32(1))
            return carry, (stats.traced_rays, stats.loss,
                           stats.num_train_records)

        return jax.lax.scan(body, (image, state, it0, sub0), None, length=spp)

    jloop = jax.jit(loop)
    cam = r._camera_arrays()
    lr = jnp.float32(r.hyper.learning_rate)

    def run_rep(image, state, it, sub):
        carry, outs = jloop(
            r.device_scene, state, image, cam, jnp.int32(it),
            jnp.uint32(sub), lr
        )
        image, state = carry[0], carry[1]
        # True completion barrier: scalar readbacks of values that depend on
        # every frame. (block_until_ready alone can return early on relayed
        # remote backends, which would inflate the result.)
        float(jnp.ravel(image)[0])
        float(jnp.ravel(state.params.w_in)[0])
        return image, state, outs

    # compile + steady-state warm rep (uncounted)
    image, state, outs = run_rep(r.image, r.net_state, r.iteration,
                                 r.total_subframe)
    it = r.iteration + spp
    sub = r.total_subframe + spp
    rep_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        image, state, outs = run_rep(image, state, it, sub)
        rep_times.append(time.perf_counter() - t0)
        it += spp
        sub += spp
    rep_times.sort()
    dt = rep_times[len(rep_times) // 2]  # median rep
    log("rep times (s): " + ", ".join(f"{t:.3f}" for t in rep_times))

    fps = spp / dt
    # PRIMARY metric: rays actually cast (closest-hit segments of live lanes
    # + shadow rays with a valid light sample, counted on-device per frame).
    # Secondary: the potential-ray figure — (pixels+tiles) x (max_depth+1)
    # x 2 — which assumes every path traces every segment; the area-spread
    # heuristic truncates most FULL-mode paths in 1-2 bounces, so potential
    # overstates traced severalfold.
    traced = int(jnp.sum(outs[0]))  # last rep's frames (steady state)
    mrays = traced / dt / 1e6
    last_loss = float(outs[1][-1])
    last_records = int(outs[2][-1])
    n_pixels = r.cfg.num_pixels
    n_tiles = r.cfg.num_tiles
    segs = r.cfg.max_depth + 1
    potential_mrays = (n_pixels + n_tiles) * segs * 2 * fps / 1e6

    log(
        f"{spp} spp in {dt:.3f}s (median of {reps} one-dispatch reps) -> "
        f"{fps:.2f} fps, {mrays:.2f} Mrays/s traced "
        f"({potential_mrays:.2f} potential), "
        f"loss {last_loss:.4f}, records {last_records}"
    )

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs = 1.0
    if os.path.isfile(baseline_path):
        try:
            with open(baseline_path) as f:
                base = json.load(f)
            # prefer a traced-ray baseline entry; fall back to comparing the
            # potential figure against the (potential-accounted) first-run
            # baseline so the speedup ratio stays accounting-consistent
            if "mrays_per_s_traced" in base:
                vs = mrays / float(base["mrays_per_s_traced"])
            else:
                vs = potential_mrays / float(base["mrays_per_s"])
        except Exception:
            vs = 1.0

    wd.cancel()
    payload = {
        "metric": "mrays_per_s",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs, 4),
        "potential_mrays_per_s": round(potential_mrays, 3),
        "timing": f"in-program {spp}-frame scan, median of {reps} reps",
    }
    try:  # cache for the watchdog fallback of a future dead-tunnel run
        with open(LAST_GOOD, "w") as f:
            json.dump(payload, f)
    except Exception:
        pass
    print(json.dumps(payload))


def _is_backend_unavailable(e: BaseException) -> bool:
    """TPU-unreachable initialization failures (tunnel down, device busy) —
    the only error class where reporting the cached last-good number is
    honest. Genuine in-process regressions must NOT inherit it."""
    msg = f"{type(e).__name__}: {e}".lower()
    return any(
        k in msg
        for k in (
            "backend", "tpu", "pjrt", "unavailable", "deadline",
            "connection", "unimplemented: axon",
        )
    )


if __name__ == "__main__":
    # A fast terminal error must still produce the one JSON line the driver
    # parses. Backend-unavailable errors (which the hang watchdog never
    # sees) fall back to the cached last-good result, like the watchdog; a
    # genuine in-process crash reports value 0 and exits nonzero so a broken
    # build cannot masquerade as the previous good run.
    try:
        main()
    except KeyboardInterrupt:
        raise
    except BaseException as e:  # noqa: BLE001 — anything, incl. SystemExit
        log(f"bench failed: {type(e).__name__}: {e}")
        import traceback

        traceback.print_exc(file=sys.stderr)
        if _is_backend_unavailable(e):
            print(json.dumps(_stale_payload(
                f"bench error: {type(e).__name__}")), flush=True)
            os._exit(0)
        print(json.dumps({
            "metric": "mrays_per_s", "value": 0.0, "unit": "Mrays/s",
            "vs_baseline": 0.0, "stale": True,
            "note": f"in-process bench error: {type(e).__name__}",
        }), flush=True)
        os._exit(1)
