"""OpenPose: net parity vs reference torch models + decode behavior tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests import ref_utils
from tests.ref_utils import assert_close


def _rand_init(net, scale=0.02):
    import torch

    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn_like(p) * scale)


def test_body_net_parity():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.controlnet_annotator.openpose.model import bodypose_model

    from pfd_tpu.annotators.nets import openpose as jop
    from pfd_tpu.io.convert import torch_sd_to_pytree

    ref_utils.seed_all(0)
    net = bodypose_model().eval()
    _rand_init(net)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(net))

    x = np.random.rand(1, 3, 48, 40).astype(np.float32) - 0.5
    with torch.no_grad():
        paf, heat = net(torch.from_numpy(x))
    jpaf, jheat = jop.body_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert_close(jpaf, ref_utils.t2n(paf).transpose(0, 2, 3, 1), rtol=5e-3,
                 atol=1e-3, name="body paf")
    assert_close(jheat, ref_utils.t2n(heat).transpose(0, 2, 3, 1), rtol=5e-3,
                 atol=1e-3, name="body heat")


def test_hand_net_parity():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.controlnet_annotator.openpose.model import handpose_model

    from pfd_tpu.annotators.nets import openpose as jop
    from pfd_tpu.io.convert import torch_sd_to_pytree

    ref_utils.seed_all(1)
    net = handpose_model().eval()
    _rand_init(net)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(net))

    x = np.random.rand(1, 3, 48, 48).astype(np.float32) - 0.5
    with torch.no_grad():
        want = net(torch.from_numpy(x))
    got = jop.hand_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1), rtol=5e-3,
                 atol=1e-3, name="hand heat")


def test_face_net_parity():
    ref_utils.load_reference()
    import torch

    try:
        from lib.model_zoo.controlnet_annotator.openpose.face import FaceNet
    except ImportError as e:
        pytest.skip(f"reference face module needs {e.name}")

    from pfd_tpu.annotators.nets import openpose as jop
    from pfd_tpu.io.convert import torch_sd_to_pytree

    ref_utils.seed_all(2)
    net = FaceNet().eval()
    _rand_init(net)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(net))

    x = np.random.rand(1, 3, 40, 40).astype(np.float32) - 0.5
    with torch.no_grad():
        want = net(torch.from_numpy(x))[-1]
    got = jop.face_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1), rtol=5e-3,
                 atol=1e-3, name="face heat")


def _synthetic_person(h=96, w=96):
    """Idealized heatmaps+PAFs for one stick figure -> decoder ground truth."""
    from pfd_tpu.annotators.nets.openpose import _LIMB_SEQ, _MAP_IDX

    pts = {
        1: (48, 18), 2: (48, 30), 3: (38, 30), 4: (34, 44), 5: (32, 58),
        6: (58, 30), 7: (62, 44), 8: (64, 58), 9: (42, 56), 10: (42, 72),
        11: (42, 88), 12: (54, 56), 13: (54, 72), 14: (54, 88),
        15: (45, 14), 16: (51, 14), 17: (42, 16), 18: (54, 16),
    }
    heat = np.zeros((h, w, 19), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for part, (x, y) in pts.items():
        heat[:, :, part - 1] = np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / 6.0)
    paf = np.zeros((h, w, 38), np.float32)
    for limb, midx in zip(_LIMB_SEQ, _MAP_IDX):
        a, b = np.array(pts[limb[0]], float), np.array(pts[limb[1]], float)
        v = b - a
        n = np.linalg.norm(v)
        u = v / max(n, 1e-6)
        # points near the segment get the unit direction
        t = np.clip(((xx - a[0]) * v[0] + (yy - a[1]) * v[1]) / max(n * n, 1e-6), 0, 1)
        px, py = a[0] + t * v[0], a[1] + t * v[1]
        mask = (xx - px) ** 2 + (yy - py) ** 2 <= 9
        paf[:, :, midx[0] - 19][mask] = u[0]
        paf[:, :, midx[1] - 19][mask] = u[1]
    return pts, heat, paf


def test_body_decode_synthetic():
    from pfd_tpu.annotators.nets import openpose as jop

    pts, heat, paf = _synthetic_person()
    candidate, subset = jop.decode_body(heat, paf, 96)
    assert len(subset) == 1, f"expected 1 person, got {len(subset)}"
    assert subset[0][-1] == 18, f"expected 18 parts, got {subset[0][-1]}"
    bodies = jop.format_body_result(candidate, subset)
    for i, kp in enumerate(bodies[0].keypoints):
        ex, ey = pts[i + 1]
        assert abs(kp.x - ex) <= 2 and abs(kp.y - ey) <= 2, \
            f"part {i}: got ({kp.x},{kp.y}), want ({ex},{ey})"


def test_draw_and_json():
    from pfd_tpu.annotators.nets import openpose as jop

    pts, heat, paf = _synthetic_person()
    candidate, subset = jop.decode_body(heat, paf, 96)
    bodies = jop.format_body_result(candidate, subset)
    norm = [jop.Keypoint(k.x / 96, k.y / 96) for k in bodies[0].keypoints]
    pose = jop.PoseResult(jop.BodyResult(norm, 18.0, 18), None, None, None)
    canvas = jop.draw_poses([pose], 96, 96)
    assert canvas.shape == (96, 96, 3) and (canvas > 0).any()
    js = jop.encode_poses_as_json([pose], 96, 96)
    import json
    data = json.loads(js)
    assert len(data["people"]) == 1
    assert len(data["people"][0]["pose_keypoints_2d"]) == 18 * 3
