"""KAIST Complex Urban replay driver (L5) — the `bag` executable equivalent.

Usage:
    python -m plviwo_tpu.run_kaist --root /data/urban26 [--wheel] [--gps]
        [--lines] [--out traj.txt]

Mirrors the reference's offline flow (`run_bag.cpp:51-144`): stream
time-ordered sensor events into the estimator, save a TUM trajectory, report
timing + (when global_pose.csv exists) posyaw-aligned ATE.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="PL-VIWO TPU: KAIST replay")
    ap.add_argument("--root", required=True, help="sequence root (contains sensor_data/)")
    ap.add_argument("--duration", type=float, default=None, help="seconds to replay")
    ap.add_argument("--wheel", action="store_true")
    ap.add_argument("--gps", action="store_true")
    ap.add_argument("--lines", action="store_true")
    ap.add_argument("--dynamic", action="store_true")
    ap.add_argument("--config", type=str, default=None,
                    help="layered YAML config (see configs/kaist/config.yaml)")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from .config.options import EstimatorOptions
    from .core.system import VioSystem
    from .data.kaist import KaistDataset
    from .update.line_tracker import LineTracker
    from .update.tracker import KltTracker

    ds = KaistDataset(args.root)
    if not ds.has_imu:
        print(json.dumps({"error": f"no sensor_data/xsens_imu.csv under {args.root}"}))
        return 2

    # default left-camera calibration (standard KAIST rig); overridden by the
    # layered YAML config's cam.intrinsics/extrinsics (configs/kaist/
    # config_camera.yaml carries the reference's calibrated values)
    cam_k = [816.402, 817.316, 608.826, 266.688, -0.0568, 0.0836, 0.0007, -0.0004]
    cam_q = [0.5019, -0.4999, 0.4981, -0.5001]  # q_ItoC approx (forward camera)
    cam_p = [0.0, 0.0, 0.0]
    cam_dt = 0.0

    if args.config:
        from .config.yaml_io import load_options

        opts = load_options(args.config).est
        if opts.cam.intrinsics:
            cam_k = list(opts.cam.intrinsics[0])
        if opts.cam.extrinsics:
            ext = list(opts.cam.extrinsics[0])
            cam_q, cam_p = ext[0:4], ext[4:7]
        if opts.cam.timeoffsets:
            cam_dt = float(opts.cam.timeoffsets[0])
    else:
        opts = EstimatorOptions()
    opts.dynamic_cloning = args.dynamic or opts.dynamic_cloning
    opts.cam.sigma_pix = 1.5
    opts.cam.chi2_mult = 8.0
    opts.cam.min_track_length = 4
    opts.cam.max_msckf = 40
    opts.cam.use_lines = args.lines
    if args.wheel:
        opts.wheel.enabled = True
        opts.wheel.type = "Wheel3DAng"
        opts.wheel.noise_w = 0.2
        opts.wheel.noise_v = 0.5
        opts.wheel.noise_p = 0.1
        opts.wheel.intrinsics = list(ds.wheel_intr)
    if args.gps:
        opts.gps.enabled = True
        opts.gps.noise = 3.0
        opts.gps.chi2_mult = 9999.0  # reference kaist config
        opts.gps.init_distance = 20.0

    sys_ = VioSystem(opts)
    sys_.set_calibration(cam_k, cam_q, cam_p, cam_dt=cam_dt)
    if args.wheel:
        sys_.set_wheel_calibration([0.0, 0.0, 0.0, 1.0], [0.0, 0.0, 0.0],
                                   list(ds.wheel_intr))

    tracker = KltTracker(n_pts=150, cam_k=np.asarray(cam_k), grid_x=16, grid_y=10)
    ltracker = LineTracker(max_lines=opts.cam.max_lines) if args.lines else None

    t0_wall = time.time()
    t_start = None
    n_frames = 0
    for t, kind, payload in ds.stream():
        if t_start is None:
            t_start = t
        if args.duration and t - t_start > args.duration:
            break
        if kind == "imu":
            sys_.feed_imu(t, payload[0], payload[1])
        elif kind == "wheel" and args.wheel:
            sys_.feed_wheel(t, payload[0], payload[1])
        elif kind == "gps" and args.gps:
            sys_.feed_gps(t, *payload)
        elif kind == "image" and ds.has_images:
            img = ds.image(t)
            ids, uvs = tracker.feed(img)
            if ltracker is not None:
                lids, segs, lpids = ltracker.feed(img, ids, uvs)
                sys_.feed_camera(t, ids, uvs, lids, segs, lpids)
            else:
                sys_.feed_camera(t, ids, uvs)
            n_frames += 1
    wall = time.time() - t0_wall

    if args.out and sys_.traj:
        from .eval.loader import save_tum

        arr_t = [t for t, _, _ in sys_.traj]
        arr_p = [p for _, _, p in sys_.traj]
        arr_q = [q for _, q, _ in sys_.traj]
        save_tum(args.out, arr_t, arr_p, arr_q)

    summary = {"frames": n_frames, "clones": sys_.stats["clones"],
               "updates": sys_.stats["updates"], "wall_s": round(wall, 1),
               "fps": round(n_frames / max(wall, 1e-9), 2)}

    gt_t, gt_p, gt_R = ds.ground_truth()
    if len(gt_t) > 10 and len(sys_.traj) > 10:
        from .eval.metrics import ate

        t_e = np.asarray([t for t, _, _ in sys_.traj])
        p_e = np.asarray([p for _, _, p in sys_.traj])
        res = ate(t_e, p_e, None, gt_t, gt_p, None, method="posyaw", tol=0.05)
        summary["ate_rmse_m"] = res.get("pos", {}).get("rmse")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
