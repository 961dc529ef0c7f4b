"""Scale-adaptive tracking demo — the tracking samples' role
(tracking/samples/tracker.cpp / csrt.cpp).

Runs CSRT+DSST on a synthetic zoom-and-pan sequence and prints per-frame
center/box; translation-only CSRT is run alongside to show the scale
filter's effect.

Usage:
    python samples/tracking_demo.py [n_frames]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# FFT-domain compute: the remote-TPU tunnel's FFT compile path is
# erratically slow; these demos pin to CPU (the kernels are tiny)
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    import jax.numpy as jnp
    from opencv_contrib_tpu.tracking import csrt, dsst

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.default_rng(0)
    tex = rng.uniform(0.2, 1.0, (64, 64)).astype(np.float32)
    H, W = 160, 200

    def frame(i):
        from PIL import Image
        sz = int(28 + i * 1.2)
        cy, cx = 80 + i, 90 + 2 * i
        img = np.full((H, W), 0.1, np.float32)
        t = np.asarray(Image.fromarray((tex * 255).astype(np.uint8))
                       .resize((sz, sz))) / 255.0
        img[cy - sz // 2: cy - sz // 2 + sz, cx - sz // 2: cx - sz // 2 + sz] = t
        return img, (cy, cx, sz)

    img0, (cy, cx, sz) = frame(0)
    st_s = dsst.csrt_scale_init(jnp.asarray(img0), (cy, cx), target_hw=(sz, sz))
    st_p = csrt.csrt_init(jnp.asarray(img0), (cy, cx), target_hw=(sz, sz))
    for i in range(1, n):
        img, (ty, tx, tsz) = frame(i)
        st_s, (c, box), _ = dsst.csrt_scale_update(st_s, jnp.asarray(img))
        st_p, _ = csrt.csrt_update(st_p, jnp.asarray(img))
        print(f"frame {i:2d}: true ({ty},{tx},{tsz:2d})  "
              f"csrt+dsst ({float(c[0]):.0f},{float(c[1]):.0f},{float(box[0]):.0f})  "
              f"csrt-only ({float(st_p.center[0]):.0f},{float(st_p.center[1]):.0f},{sz})")


if __name__ == "__main__":
    main()
