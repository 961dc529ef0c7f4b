"""Perf smoke sweep: time representative entry points across modules on the
real TPU to catch layout-bound / scatter-bound pathologies (the pattern
that made FSRCNN 7x slower than CPU and CLAHE 44x off before their
rewrites). Prints one `module.op: ms` line each; add cases as modules grow.

Usage: python scripts/perf_smoke.py [filter-substring]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opencv_contrib_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp


def bench(f, *args, n=20):
    g = jax.jit(f)
    r = g(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = g(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main(filt=""):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((480, 640)).astype(np.float32))
    img3 = jnp.asarray(rng.random((480, 640, 3)).astype(np.float32))
    small = jnp.asarray(rng.random((240, 320)).astype(np.float32))
    pair = (img, jnp.roll(img, 2, axis=1))

    cases = {}

    def case(name, fn):
        if filt in name:
            cases[name] = fn

    from opencv_contrib_tpu.ops import histogram as ohist, filters as ofil
    case("ops.histogram", lambda: lambda x: ohist.histogram(x))
    case("ops.clahe", lambda: lambda x: ohist.clahe(x))
    case("ops.gaussian", lambda: lambda x: ofil.gaussian_blur(x, 2.0))

    from opencv_contrib_tpu import ximgproc
    case("ximgproc.guided", lambda: lambda x: ofil.guided_filter(x, x, 8, 1e-3))
    case("ximgproc.dtf", lambda: lambda x: ximgproc.dt_filter(x, x))
    case("ximgproc.fgs", lambda: lambda x: ximgproc.fast_global_smoother(x, x))
    case("ximgproc.slic", lambda: lambda x: ximgproc.slic(jnp.repeat(x[..., None], 3, -1), grid=32, n_iters=4)[0])
    case("ximgproc.anisotropic", lambda: lambda x: ximgproc.anisotropic_diffusion(x))

    from opencv_contrib_tpu.stereo import matching as st
    case("stereo.bm", lambda: lambda l, r: st.block_match(l, r, max_disp=32)[0])
    case("stereo.sgm", lambda: lambda l, r: st.sgm_match(l, r, max_disp=32)[0])

    from opencv_contrib_tpu.flow import dis as fdis, tvl1 as ftv
    case("flow.dis", lambda: lambda a, b: fdis.compute(a, b))
    case("flow.tvl1", lambda: lambda a, b: ftv.compute(a, b))

    from opencv_contrib_tpu import xphoto
    case("xphoto.dct_denoise", lambda: lambda x: xphoto.dct_denoise(x, 0.05))
    case("xphoto.grayworld", lambda: lambda x: xphoto.grayworld_wb(x))

    from opencv_contrib_tpu import img_hash
    case("img_hash.phash", lambda: lambda x: img_hash.phash(x))

    from opencv_contrib_tpu import quality
    case("quality.ssim", lambda: lambda a, b: quality.ssim(a, b))
    case("quality.gmsd", lambda: lambda a, b: quality.gmsd(a, b))

    from opencv_contrib_tpu.features import detect as fdet
    case("features.fast_hessian", lambda: lambda x: fdet.fast_hessian(x, max_keypoints=1024)[0])

    from opencv_contrib_tpu import saliency as sal
    case("saliency.spectral", lambda: lambda x: sal.spectral_residual(x))

    from opencv_contrib_tpu import intensity_transform as itf
    case("intensity.bimef", lambda: lambda x: itf.bimef(x))

    results = {}
    for name, make in sorted(cases.items()):
        try:
            fn = make()
            if name in ("stereo.bm", "stereo.sgm", "flow.dis", "flow.tvl1",
                        "quality.ssim", "quality.gmsd"):
                t = bench(fn, *pair)
            elif name in ("xphoto.grayworld",):
                t = bench(fn, img3)
            else:
                t = bench(fn, img)
            results[name] = t
            print(f"{name}: {t:.2f} ms")
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:120]}")
    return results


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "")
