"""Per-stage S-sweep of the multistream chunked step (VERDICT r3 next #1).

Times lax.scan over a CHUNK-frame chunk of an S-stream batch where the
scanned body is a progressively larger prefix of the tracking pipeline
(mirroring scripts/profile_scan.py, but batched the exact way
parallel/multistream.py batches: ONE perception pass over 2S images, then
vmap over the per-stream state machine). The ms/frame-per-stream column as a
function of S shows which stage fails to amortize.

Through the remote-compile relay a SECOND Pallas-bearing executable in one
process can fail with InvalidArgument, so each invocation compiles exactly
ONE executable:

    python scripts/profile_s_sweep.py --warm /tmp/vostate.npz
    python scripts/profile_s_sweep.py --state /tmp/vostate.npz --row 4 --s 8

and a driver loop sweeps (row, S) across processes.

r5 NOTE: the stage rows model the r3/r4 DENSE descriptor pipeline
(planes kernel + gathers); production extraction moved to the patch mode
(config.descriptor_mode) in r5. For current per-op attribution use
scripts/profile_xplane.py (one trace, whole picture); this sweep remains
the right tool for prefix-marginal questions on the dense fallback.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 8


def _anchor(out):
    np.asarray(jax.tree_util.tree_leaves(out)[-1])


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _anchor(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _anchor(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def save_state(state, path):
    leaves, _ = jax.tree_util.tree_flatten(state)
    np.savez(path, **{f"l{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_state(path, config):
    from lvt_tpu.core.state import VOState

    template = VOState.initial(config.max_map_points,
                               config.max_staged_points,
                               config.local_ba_window)
    _, treedef = jax.tree_util.tree_flatten(template)
    data = np.load(path)
    leaves = [jnp.asarray(data[f"l{i}"]) for i in range(len(data.files))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_frames(config, n):
    from lvt_tpu.io.synthetic import SyntheticWorld

    world = SyntheticWorld(
        width=config.img_width, height=config.img_height,
        fx=config.fx, fy=config.fy, cx=config.cx, cy=config.cy,
        baseline=config.baseline, n_points=6000,
        extent_x=80.0, extent_y=20.0, extent_z=160.0,
    )
    frames = list(world.stereo_sequence(n, speed=0.9))
    il = np.stack([f[0].astype(np.uint8) for f in frames])
    ir = np.stack([f[1].astype(np.uint8) for f in frames])
    return il, ir


def warm(path):
    import __graft_entry__ as ge
    from lvt_tpu.core import step as step_mod
    from lvt_tpu.core.state import VOState

    config = ge._kitti_config()
    il, ir = make_frames(config, 10)
    il, ir = jnp.asarray(il), jnp.asarray(ir)
    state = VOState.initial(config.max_map_points, config.max_staged_points,
                            config.local_ba_window)
    step = jax.jit(lambda s, a, b: step_mod.track_step_stereo(s, a, b, config))
    for i in range(10):
        state, _, _ = step(state, il[i], ir[i])
    _anchor(state.pose.t)
    save_state(state, path)
    print(f"saved warmed state (map={int(state.map.size())}) to {path}",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm", help="run warmup steps and save state here")
    ap.add_argument("--state", help="load warmed state from here")
    ap.add_argument("--row", type=int, default=4)
    ap.add_argument("--s", type=int, default=1)
    args = ap.parse_args()

    if args.warm:
        warm(args.warm)
        return

    import __graft_entry__ as ge
    from lvt_tpu.core import extract as ex, step as step_mod, map as map_ops
    from lvt_tpu.core.motion import predict_next_pose
    from lvt_tpu.ops import matching
    from lvt_tpu.solver.pnp import solve_pnp
    from lvt_tpu.parallel import multistream as ms

    config = ge._kitti_config()
    if os.environ.get("LVT_DENSE_BRIEF"):
        config = config.replace(use_dense_brief=True)
    cam = step_mod._camera_kwargs(config)
    k = config.kp_capacity
    S = args.s

    state1 = load_state(args.state, config)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (S,) + x.shape), state1)
    states = jax.tree.map(jnp.asarray, states)  # materialize

    il, ir = make_frames(config, CHUNK)
    ca = jnp.asarray(np.broadcast_to(il[:, None], (CHUNK, S) + il.shape[1:]))
    cb = jnp.asarray(np.broadcast_to(ir[:, None], (CHUNK, S) + ir.shape[1:]))
    jax.block_until_ready((states, ca, cb))

    flags = dict(use_kernel=step_mod._use_matching_kernel(config),
                 use_mxu=step_mod._use_mxu_hamming(config))

    def extract_both(a, b):
        """ONE batched perception pass over 2S images (= multistream path)."""
        feats = ex.extract_features_batched(jnp.concatenate([a, b]), config)
        left = jax.tree.map(lambda x: x[:S], feats)
        right = jax.tree.map(lambda x: x[S:], feats)
        return left, right

    # --- sub-stages of extraction (rows 10-12) ---
    def body_maps_only(s, a, b):
        raw, nms, planes = ex.perception_batched(
            jnp.concatenate([a, b]), config)
        return s, (raw.sum() + nms.sum() + planes.sum(dtype=jnp.float32))

    def body_select(s, a, b):
        from lvt_tpu.ops import detect

        raw, nms, planes = ex.perception_batched(
            jnp.concatenate([a, b]), config)
        det = jax.vmap(lambda r, n: detect.select_corners(
            r, n, config.agast_threshold,
            cell_size=config.detection_cell_size,
            max_per_cell=config.max_keypoints_per_cell,
            corners_low_threshold=config.corners_low_threshold))(raw, nms)
        return s, det.kp.sum()

    # --- pipeline prefixes (rows 0-4) ---
    def body0(s, a, b):
        left, right = extract_both(a, b)
        return s, (left.kp.sum() + right.kp.sum())

    def match_of(s1, left):
        _, predicted = predict_next_pose(s1.motion, s1.pose)
        mm = matching.find_map_matches(
            s1.map.pos, s1.map.desc, s1.map.valid, predicted, left,
            tracking_radius=config.tracking_radius,
            ratio_threshold=config.tracking_ratio_test_threshold,
            abs_threshold=config.descriptor_matching_threshold,
            retry_min_matches=config.n_matches_threshold, **flags, **cam)
        return predicted, mm

    def body1(s, a, b):
        left, right = extract_both(a, b)

        def one(s1, l):
            _, mm = match_of(s1, l)
            return mm.matches_count

        return s, jax.vmap(one)(s, left)

    def body2(s, a, b):
        left, right = extract_both(a, b)

        def one(s1, l):
            predicted, mm = match_of(s1, l)
            obs = l.kp[jnp.clip(mm.match_idx, 0, k - 1)]
            w = (mm.match_idx >= 0).astype(jnp.float32)
            pnp = solve_pnp(predicted, s1.map.pos, obs, w,
                            fx=config.fx, fy=config.fy, cx=config.cx,
                            cy=config.cy,
                            reprojection_th2=config.reprojection_th2)
            return pnp.inlier_count

        return s, jax.vmap(one)(s, left)

    def body3(s, a, b):
        left, right = extract_both(a, b)

        def one(s1, l):
            predicted, mm = match_of(s1, l)
            obs = l.kp[jnp.clip(mm.match_idx, 0, k - 1)]
            w = (mm.match_idx >= 0).astype(jnp.float32)
            pnp = solve_pnp(predicted, s1.map.pos, obs, w,
                            fx=config.fx, fy=config.fy, cx=config.cx,
                            cy=config.cy,
                            reprojection_th2=config.reprojection_th2)
            mb = map_ops.apply_match_bookkeeping(s1.map, mm.match_idx)
            mc, fm = map_ops.clean_untracked(mb, mm.match_idx,
                                             mm.feature_matched,
                                             config.untracked_threshold)
            st, promo, fm = step_mod._staged_update(
                s1.staged, pnp.pose, l, fm, mc.size(), config)
            return s1._replace(map=mc, staged=st), fm.sum()

        s2, out = jax.vmap(one)(s, left)
        return s2, out

    def body4(s, a, b):
        s2, poses, _ = ms._step_stereo_batched(s, a, b, config)
        return s2, poses.t

    # --- matching sub-stages (rows 20-22): attribute row1 - row0 ---
    from lvt_tpu.geometry import se3 as se3_mod
    from lvt_tpu.ops import hamming as ham

    def body20(s, a, b):
        left, right = extract_both(a, b)

        def one(s1, l):
            return ham.hamming_matrix(s1.map.desc, l.desc,
                                      use_mxu=flags["use_mxu"]).sum()

        return s, jax.vmap(one)(s, left)

    def body21(s, a, b):
        left, right = extract_both(a, b)

        def one(s1, l):
            _, predicted = predict_next_pose(s1.motion, s1.pose)
            w2c = se3_mod.world_to_camera(predicted)
            pts_cam = se3_mod.transform_points(w2c, s1.map.pos)
            uv = se3_mod.project_points(pts_cam, config.fx, config.fy,
                                        config.cx, config.cy)
            dist = ham.hamming_matrix(s1.map.desc, l.desc,
                                      use_mxu=flags["use_mxu"])
            (d1, d2, best, nc), wide = matching.dual_radius_top2(
                dist, uv, s1.map.valid, l.kp, l.valid,
                config.tracking_radius, 2 * config.tracking_radius,
                flags["use_kernel"])
            return d1.sum() + wide[0].sum()

        return s, jax.vmap(one)(s, left)

    def body25(s, a, b):
        """Like row 11 but subpixel OFF — isolates the subpixel-refine
        scatter-gather cost inside selection."""
        from lvt_tpu.ops import detect

        raw, nms, planes = ex.perception_batched(
            jnp.concatenate([a, b]), config)
        det = jax.vmap(lambda r, n: detect.select_corners(
            r, n, config.agast_threshold,
            cell_size=config.detection_cell_size,
            max_per_cell=config.max_keypoints_per_cell,
            corners_low_threshold=config.corners_low_threshold,
            subpixel=False))(raw, nms)
        return s, det.kp.sum()

    def body26(s, a, b):
        """Perception kernels only, minimally consumed (tiny slices, no
        full-map reductions — row 10 inflated its number with 60M-element
        sums)."""
        raw, nms, planes = ex.perception_batched(
            jnp.concatenate([a, b]), config)
        return s, (raw[:, ::64, ::64].sum() + nms[:, ::64, ::64].sum()
                   + planes[:, :, ::64, ::64].sum(dtype=jnp.float32))

    rs_d = np.random.RandomState(7)
    const_feat_desc = jnp.asarray(
        rs_d.randint(0, 2**32, (S, 1536, 8), np.uint64).astype(np.uint32))
    const_map_desc = jnp.asarray(
        rs_d.randint(0, 2**32, (S, 1024, 8), np.uint64).astype(np.uint32))

    def body22(s, a, b):
        """Extraction in the body, but hamming on CONSTANT descriptors —
        if fast, the slowdown comes through the extraction->desc dataflow."""
        left, right = extract_both(a, b)

        def one(s1, cm, cf):
            return ham.hamming_matrix(cm, cf,
                                      use_mxu=flags["use_mxu"]).sum()

        out = jax.vmap(one)(s, const_map_desc, const_feat_desc)
        return s, out + left.kp.sum()

    def body23(s, a, b):
        """Real map desc (carry) x CONSTANT feature desc."""
        left, right = extract_both(a, b)

        def one(s1, cf):
            return ham.hamming_matrix(s1.map.desc, cf,
                                      use_mxu=flags["use_mxu"]).sum()

        out = jax.vmap(one)(s, const_feat_desc)
        return s, out + left.kp.sum()

    def body24(s, a, b):
        """CONSTANT map desc x real feature desc (extraction output)."""
        left, right = extract_both(a, b)

        def one(s1, cm, l):
            return ham.hamming_matrix(cm, l.desc,
                                      use_mxu=flags["use_mxu"]).sum()

        return s, jax.vmap(one)(s, const_map_desc, left)

    rows = {
        0: ("extract only", body0),
        1: ("+ map match", body1),
        2: ("+ pnp", body2),
        3: ("+ bookkeeping/staged", body3),
        4: ("full step", body4),
        10: ("perception maps only", body_maps_only),
        11: ("maps + select", body_select),
        20: ("extract + hamming mat", body20),
        21: ("extract + ham + top2", body21),
        22: ("extract + ham(const,const)", body22),
        23: ("extract + ham(carry,const)", body23),
        24: ("extract + ham(const,feat)", body24),
        25: ("maps + select no-subpix", body25),
        26: ("perception maps minimal", body26),
    }
    name, body = rows[args.row]

    @jax.jit
    def run(state, ca, cb):
        def f(s, ab):
            return body(s, ab[0], ab[1])
        return jax.lax.scan(f, state, (ca, cb))

    ms_chunk = timeit(run, states, ca, cb)
    per = ms_chunk / (CHUNK * S)
    print(f"S={S:3d} row={args.row} {name:24s} {ms_chunk:9.2f} ms/chunk  "
          f"{per:7.4f} ms/(frame*stream)", flush=True)


if __name__ == "__main__":
    main()
