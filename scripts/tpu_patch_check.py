"""On-chip validation for the r5 patch-extraction kernel + int16 probes.

Run BEFORE wiring anything into the production step (the r4 lesson:
interpret-mode-exact Pallas code can silently miscompile on real v5e —
see ops/perception_pallas._roll2). One process, three checks:

  1. extract_patches_batched on the real chip vs a host-numpy reference
     at the exact bench geometry (384x1280 padded maps, K=1536): must be
     bit-exact.
  2. pltpu.bitcast int16<->int32 packing semantics probe (which axis
     pairs?) — prerequisite for the int16 perception-kernel roll rewrite.
  3. int16 roll emulation via 32-bit ops vs the f32 roll result, all
     (dy, dx) offsets the perception kernels use: must be bit-exact.

    PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
        timeout 1500 python scripts/tpu_patch_check.py
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def check_patches() -> None:
    import jax.numpy as jnp

    from lvt_tpu.ops import patches_pallas as pt

    rng = np.random.RandomState(0)
    bsz, hp, wp, k = 2, 384, 1280, 1536
    smooth = rng.rand(bsz, hp, wp).astype(np.float32) * 20000.0
    raw = rng.rand(bsz, hp, wp).astype(np.float32) * 100.0
    x = rng.randint(pt.PATCH_C0, wp - pt.PATCH + pt.PATCH_C0 + 1,
                    (bsz, k)).astype(np.int32)
    y = rng.randint(pt.PATCH_R0, hp - pt.PATCH + pt.PATCH_R0 + 1,
                    (bsz, k)).astype(np.int32)
    valid = rng.rand(bsz, k) > 0.3

    # host reference (invalid slots stay zero)
    pr = np.zeros((bsz, k, pt.PATCH, pt.PATCH), np.float32)
    rr = np.zeros((bsz, k, pt.RAWP, pt.RAWP), np.float32)
    for b in range(bsz):
        for i in range(k):
            if not valid[b, i]:
                continue
            yy, xx = y[b, i], x[b, i]
            pr[b, i] = smooth[b, yy - pt.PATCH_R0:yy - pt.PATCH_R0 + pt.PATCH,
                              xx - pt.PATCH_C0:xx - pt.PATCH_C0 + pt.PATCH]
            rr[b, i] = raw[b, yy - pt.RAWP_R0:yy - pt.RAWP_R0 + pt.RAWP,
                           xx - pt.RAWP_C0:xx - pt.RAWP_C0 + pt.RAWP]

    t0 = time.time()
    p, rp = pt.extract_patches_batched(
        jnp.asarray(smooth), jnp.asarray(raw),
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid))
    p = np.asarray(p)[:, :k]
    rp = np.asarray(rp)[:, :k]
    print(f"patch kernel compile+run: {time.time() - t0:.0f}s", flush=True)
    # rough per-call timing (amortized over 20 calls; relay-noisy, the
    # full bench is the real arbiter)
    t0 = time.time()
    for _ in range(20):
        p2, rp2 = pt.extract_patches_batched(
            jnp.asarray(smooth), jnp.asarray(raw),
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid))
    np.asarray(p2)
    print(f"patch kernel ~{(time.time() - t0) / 20 * 1e3:.2f} ms/call "
          f"(B={bsz}, K={k}, ~70% valid)", flush=True)
    bad = (p != pr).sum()
    bad_r = (rp != rr).sum()
    print(f"patch mismatches: smooth {bad}/{p.size}  raw {bad_r}/{rp.size}",
          flush=True)
    assert bad == 0 and bad_r == 0, "PATCH KERNEL MISCOMPILES ON HARDWARE"
    print("patch kernel: EXACT on chip", flush=True)


def check_bitcast() -> None:
    """Which axis does pltpu.bitcast pair when widening int16 -> int32?"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a = (np.arange(16 * 256) % 4093).astype(np.int16).reshape(16, 256)

    tried = []
    for out_shape in [(8, 256), (16, 128)]:
        def kernel(x_ref, o_ref):
            o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int32)

        kernel.__name__ = f"bitcast_probe_{out_shape[0]}x{out_shape[1]}"
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(jnp.asarray(a))
            out = np.asarray(out)
        except Exception as e:  # noqa: BLE001 - probe
            tried.append((out_shape, f"FAIL {type(e).__name__}: {e}"))
            continue
        # decode hypotheses
        lo = out & 0xFFFF
        hi = (out >> 16) & 0xFFFF
        au = a.astype(np.uint16)
        if out_shape == (8, 256):
            row_lo_even = (lo == au[0::2, :]).all() and (hi == au[1::2, :]).all()
            row_lo_odd = (lo == au[1::2, :]).all() and (hi == au[0::2, :]).all()
            tried.append((out_shape, f"rows lo=even:{row_lo_even} "
                                     f"lo=odd:{row_lo_odd}"))
        else:
            col_lo_even = (lo == au[:, 0::2]).all() and (hi == au[:, 1::2]).all()
            col_lo_odd = (lo == au[:, 1::2]).all() and (hi == au[:, 0::2]).all()
            tried.append((out_shape, f"cols lo=even:{col_lo_even} "
                                     f"lo=odd:{col_lo_odd}"))
    for shape, msg in tried:
        print(f"bitcast i16->i32 out {shape}: {msg}", flush=True)


def check_int16_kernel_a() -> None:
    """int16 kernel A (sublane-pair rolls) vs f32 kernel A on real silicon:
    must be bit-exact for uint8 frames (tests prove it in interpret mode;
    this is the anti-miscompile gate)."""
    import jax.numpy as jnp

    from lvt_tpu.ops import perception_pallas as pp

    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, (2, 376, 1241), dtype=np.uint8)
    t0 = time.time()
    nms_i, raw_i, sm_i = pp.perception_patch_maps_batched(
        jnp.asarray(u8), int16=True)
    nms_f, raw_f, sm_f = pp.perception_patch_maps_batched(
        jnp.asarray(u8), int16=False)
    nms_i, raw_i, sm_i, nms_f, raw_f, sm_f = (
        np.asarray(a) for a in (nms_i, raw_i, sm_i, nms_f, raw_f, sm_f))
    print(f"kernel A i16+f32 compile+run: {time.time() - t0:.0f}s",
          flush=True)
    for got, want, name in ((nms_i, nms_f, "nms"), (raw_i, raw_f, "raw"),
                            (sm_i, sm_f, "smooth")):
        bad = (got != want).sum()
        print(f"int16 kernel A {name}: {bad}/{got.size} mismatches",
              flush=True)
        assert bad == 0, f"INT16 KERNEL A MISCOMPILES ON HARDWARE ({name})"
    print("int16 kernel A: EXACT on chip", flush=True)


def check_bf16_score() -> None:
    """bf16 score-side kernel A vs f32 on real silicon: must be bit-exact
    for uint8 frames (interpret-proven in tests/test_pallas_perception)."""
    import jax.numpy as jnp

    from lvt_tpu.ops import perception_pallas as pp

    rng = np.random.RandomState(2)
    u8 = rng.randint(0, 256, (2, 376, 1241), dtype=np.uint8)
    t0 = time.time()
    outs_b = pp.perception_patch_maps_batched(
        jnp.asarray(u8), int16=False, bf16_score=True)
    outs_f = pp.perception_patch_maps_batched(
        jnp.asarray(u8), int16=False, bf16_score=False)
    outs_b = [np.asarray(a) for a in outs_b]
    outs_f = [np.asarray(a) for a in outs_f]
    print(f"kernel A bf16+f32 compile+run: {time.time() - t0:.0f}s",
          flush=True)
    for got, want, name in zip(outs_b, outs_f, ("nms", "raw", "smooth")):
        bad = (got != want).sum()
        print(f"bf16 kernel A {name}: {bad}/{got.size} mismatches",
              flush=True)
        assert bad == 0, f"BF16 KERNEL A MISCOMPILES ON HARDWARE ({name})"
    print("bf16 score kernel A: EXACT on chip", flush=True)


def main() -> int:
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    check_patches()
    check_bitcast()
    # bf16 score path: BLOCKED on v5e ("Target does not support this
    # comparison" — 32-bit-only VPU compares); expected failure, kept
    # runnable for future targets.
    try:
        check_bf16_score()
    except Exception as e:  # noqa: BLE001
        print(f"bf16 score kernel A: still blocked ({type(e).__name__}) — "
              "expected on v5e; see ops/perception_pallas.py", flush=True)
    # int16 kernel A: BLOCKED on this toolchain — Mosaic legalizes neither
    # arith.minsi nor arith.cmpi on i16 vectors (r5 campaign; see
    # INT16_DEFAULT in ops/perception_pallas.py). The check stays runnable
    # for future toolchains but its failure is expected and non-fatal.
    try:
        check_int16_kernel_a()
    except Exception as e:  # noqa: BLE001
        print(f"int16 kernel A: still blocked ({type(e).__name__}) — "
              "expected on current Mosaic; see ops/perception_pallas.py",
              flush=True)
    print("TPU PATCH CHECK PASS", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
