"""Golden-example harness — the reference's informal regression set.

The reference's only end-to-end verification is its 11 cached Gradio examples
(fixed seeds + checkpoint combos, app.py:284-355; SURVEY §4.1). This harness
runs the same 11 cases through the TPU pipeline against the reference's
assets + published weights and gates each on SSIM vs stored goldens.

Usage (needs the reference assets/weights on disk):
    python -m pfd_tpu.tools.golden_examples --assets /path/to/reference \\
        --pretrained /path/to/pretrained --goldens out/goldens --record
    # later: drop --record to compare against the recorded goldens
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# (input, control, preprocess_method, do_preprocess, h, w, ugscale, seed,
#  tag_ctx, tag_diffuser, tag_ctl) — app.py:286-355 verbatim
EXAMPLES = [
    ("assets/examples/ghibli-input.jpg", "assets/examples/ghibli-canny.png",
     "canny", False, 768, 1024, 1.8, 23, "SeeCoder", "Deliberate-v2.0", "canny"),
    ("assets/examples/astronautridinghouse-input.jpg",
     "assets/examples/astronautridinghouse-canny.png",
     "canny", False, 512, 768, 2.0, 21, "SeeCoder", "Deliberate-v2.0", "canny"),
    ("assets/examples/grassland-input.jpg", "assets/examples/grassland-scribble.png",
     "scribble", False, 768, 512, 2.0, 41, "SeeCoder", "Deliberate-v2.0", "scribble"),
    ("assets/examples/jeep-input.jpg", "assets/examples/jeep-depth.png",
     "depth", False, 512, 768, 2.0, 30, "SeeCoder", "Deliberate-v2.0", "depth"),
    ("assets/examples/bedroom-input.jpg", "assets/examples/bedroom-mlsd.png",
     "mlsd", False, 512, 512, 2.0, 31, "SeeCoder", "Deliberate-v2.0", "mlsd"),
    ("assets/examples/nightstreet-input.jpg", "assets/examples/nightstreet-canny.png",
     "canny", False, 768, 512, 2.3, 20, "SeeCoder", "Deliberate-v2.0", "canny"),
    ("assets/examples/woodcar-input.jpg", "assets/examples/woodcar-depth.png",
     "depth", False, 768, 512, 2.0, 20, "SeeCoder", "Deliberate-v2.0", "depth"),
    ("assets/examples-anime/miku.jpg", "assets/examples-anime/miku-canny.png",
     "canny", False, 768, 576, 1.5, 22, "SeeCoder-Anime", "Anything-v4", "canny"),
    ("assets/examples-anime/random1.jpg", "assets/examples-anime/pose.png",
     "openpose", False, 768, 1536, 2.5, 28, "SeeCoder-Anime", "Oam-v2",
     "openpose_v11p"),
    ("assets/examples-anime/camping.jpg", "assets/examples-anime/pose.png",
     "openpose", False, 768, 1536, 2.0, 35, "SeeCoder-Anime", "Anything-v4",
     "openpose_v11p"),
    ("assets/examples-anime/hanfu_girl.jpg", "assets/examples-anime/pose.png",
     "openpose", False, 768, 1536, 2.0, 20, "SeeCoder-Anime", "Anything-v4",
     "openpose_v11p"),
]


def _load_image(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def run(assets_root, pretrained_root, goldens_dir, record=False,
        ssim_gate=0.95, cases=None):
    from pfd_tpu.pipeline import PromptFreeDiffusionPipeline
    from pfd_tpu.training.evaluator import ssim

    os.makedirs(goldens_dir, exist_ok=True)
    pipe = PromptFreeDiffusionPipeline(fp16=True,
                                       pretrained_root=pretrained_root)
    results = {}
    for i, (im_p, ctl_p, method, do_pre, h, w, scale, seed,
            ctx, diff, ctl) in enumerate(EXAMPLES):
        if cases is not None and i not in cases:
            continue
        im = _load_image(os.path.join(assets_root, im_p))
        imctl = _load_image(os.path.join(assets_root, ctl_p))
        out = pipe.action_inference(im, imctl, method, do_pre, h, w, scale,
                                    seed, ctx, diff, ctl)
        img = np.asarray(out[0], np.float32)
        gpath = os.path.join(goldens_dir, f"example_{i:02d}.npy")
        if record:
            np.save(gpath, img)
            results[i] = {"recorded": True}
        else:
            golden = np.load(gpath)
            s = ssim(img, golden)
            results[i] = {"ssim": s, "pass": s >= ssim_gate}
            print(f"example {i:02d}: SSIM {s:.4f} "
                  f"{'PASS' if s >= ssim_gate else 'FAIL'}")
    with open(os.path.join(goldens_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser("pfd_tpu.tools.golden_examples")
    ap.add_argument("--assets", required=True)
    ap.add_argument("--pretrained", required=True)
    ap.add_argument("--goldens", default="goldens")
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--cases", type=int, nargs="*", default=None)
    args = ap.parse_args()
    run(args.assets, args.pretrained, args.goldens, record=args.record,
        cases=args.cases)
