"""Per-frame breakdown of the slam_frontend bench's keyframe FRAME cost.

Replicates bench._bench_slam_frontend's loop and attributes each frame's
wall time to: fused-track dispatch+fetch, backpressure drain, promotion
dispatch, re-track, and event-poll advancement — to locate the remaining
median-keyframe-frame block (VERDICT r4 #2: bar is ~2x median tracked).
"""
import time
import types

import numpy as np
import jax
import jax.numpy as jnp

from rgbd360_tpu.core.frame import FrameBuilder
from rgbd360_tpu.io.calib import load_calibration
from rgbd360_tpu.apps.grabber import synth_capture, synth_trajectory_poses
from rgbd360_tpu.slam.odometry import KeyframeSLAM


def main():
    calib = load_calibration(
        "/root/reference/Calibration/Extrinsics",
        "/root/reference/Calibration/Intrinsics",
    )
    builder = FrameBuilder(calib)
    rt = np.asarray(builder.rt, np.float64)
    n = 48
    gt = synth_trajectory_poses("loop", n, radius=0.8)
    raws = [synth_capture(i, rt=rt, pose=gt[i], room="octagon") for i in range(n)]
    dev = [
        types.SimpleNamespace(rgb=jnp.asarray(r.rgb), depth_mm=jnp.asarray(r.depth_mm))
        for r in raws
    ]
    jax.block_until_ready([d.rgb for d in dev])

    slam = KeyframeSLAM(builder)
    for raw in dev:
        slam.process(raw)
    slam.flush()
    slam.reset()

    # --- instrument: wrap the interesting methods with timers
    acc = {}

    def wrap(name, fn):
        def inner(*a, **kw):
            t0 = time.time()
            try:
                return fn(*a, **kw)
            finally:
                acc[name] = acc.get(name, 0.0) + (time.time() - t0)
        return inner

    slam._event_backpressure = wrap("backpressure", slam._event_backpressure)
    orig_poll = slam._poll_pending
    slam._poll_pending = wrap("poll", orig_poll)
    orig_promote = slam._promote

    def promote_timed(*a, **kw):
        t0 = time.time()
        try:
            return orig_promote(*a, **kw)
        finally:
            acc["promote_total"] = acc.get("promote_total", 0.0) + (time.time() - t0)

    slam._promote = promote_timed
    orig_advance = slam._advance_head

    def advance_timed(*a, **kw):
        t0 = time.time()
        try:
            return orig_advance(*a, **kw)
        finally:
            acc["advance"] = acc.get("advance", 0.0) + (time.time() - t0)

    slam._advance_head = advance_timed

    rows = []
    for i, raw in enumerate(dev):
        acc.clear()
        f0 = time.time()
        ev = slam.process(raw)
        total = (time.time() - f0) * 1e3
        rows.append(
            dict(
                i=i,
                kf=bool(ev.get("keyframe")),
                total=total,
                poll=acc.get("poll", 0.0) * 1e3,
                backp=acc.get("backpressure", 0.0) * 1e3,
                promote=acc.get("promote_total", 0.0) * 1e3,
                advance=acc.get("advance", 0.0) * 1e3,
                pending=len(slam._pending),
            )
        )
    t_flush = time.time()
    slam.flush()
    flush_ms = (time.time() - t_flush) * 1e3

    print(f"{'i':>3} {'kf':>3} {'total':>8} {'poll':>8} {'backp':>8} "
          f"{'promote':>8} {'advance':>8} {'pend':>5}")
    for r in rows:
        print(f"{r['i']:>3} {str(r['kf'])[:1]:>3} {r['total']:>8.1f} "
              f"{r['poll']:>8.1f} {r['backp']:>8.1f} {r['promote']:>8.1f} "
              f"{r['advance']:>8.1f} {r['pending']:>5}")
    kf_ms = [r["total"] for r in rows if r["kf"]]
    tr_ms = [r["total"] for r in rows if not r["kf"]]
    print(f"\nmedian tracked {np.median(tr_ms):.1f} ms, "
          f"median KF {np.median(kf_ms):.1f} ms over {len(kf_ms)} KFs; "
          f"flush {flush_ms:.0f} ms")
    print("KF frame medians: "
          + ", ".join(
              f"{k}={np.median([r[k] for r in rows if r['kf']]):.1f}"
              for k in ("poll", "backp", "promote", "advance")))
    print("dispatch counters per event:", slam.kf_event_dispatches)


if __name__ == "__main__":
    main()
