"""Loop-closure retrieval at scale: measured recall/precision on a long
multi-revisit sequence with the shipped offline vocabulary (VERDICT round 1,
weak #4 / next-round #6).

Builds a 160-keyframe, 3.2-revolution orbit (every place revisited ~3 times),
quantizes each keyframe against the committed 4096-word vocabulary
(rgbdslam_tpu/assets/voc_synth_fast_brief.npz — the analog of the reference's
voc_TUM_FAST_BRIEF.yml.gz, main.cpp:15), and scores retrieval through the
LoopDetector's full gate stack (min-connected-score floor, id-interval gap,
top-5; PlaceRecognition/LoopDetector.cpp:28-84)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import rgbdslam_tpu  # noqa: F401
from rgbdslam_tpu.config import ExtractorConfig, LoopConfig
from rgbdslam_tpu.frontend.frame import build_frame_features
from rgbdslam_tpu.geometry.camera import Camera
from rgbdslam_tpu.io.synthetic import orbit_trajectory, render_frame
from rgbdslam_tpu.loop.detector import LoopDetector

ASSETS = os.path.join(os.path.dirname(__file__), "..",
                      "rgbdslam_tpu", "assets")
CAM = Camera(200.0, 200.0, 159.5, 119.5, width=320, height=240)
CFG = ExtractorConfig(num_features=512, num_levels=3, cell_size=8,
                      fast_threshold=15.0)


@pytest.mark.parametrize("detector,vocname", [
    ("svo_fast", "voc_synth_fast_brief.npz"),
    ("orb", "voc_synth_orb.npz"),      # ORB-steered artifact (round-3 #7)
])
def test_retrieval_recall_at_5_long_multiloop(detector, vocname):
    K = 160
    id_interval = 25          # ~half a revolution (one loop = 50 KFs)
    poses = orbit_trajectory(K, loops=3.2)
    centers = poses[:, :3, 3]
    # viewing directions (camera z in world)
    dirs = poses[:, :3, 2]

    cfg = LoopConfig(id_interval=id_interval, vocab_size=4096)
    ld = LoopDetector(cfg, max_keyframes=K + 2)
    ld.load_vocabulary(os.path.join(ASSETS, vocname))
    assert ld.words is not None and ld.idf.shape[0] == 4096

    from rgbdslam_tpu.frontend.extractor import Extractor

    ex = Extractor(CAM, CFG, detector=detector)
    for k in range(K):
        gray, depth = render_frame(CAM, jnp.asarray(poses[k]))
        f = ex(gray, depth)
        # connections: odometry neighbor + same-revolution proximity (these
        # are excluded from candidacy, like the live system's proximity edges)
        conn = {k - 1} if k > 0 else set()
        for j in range(max(0, k - id_interval), k):
            if np.linalg.norm(centers[j] - centers[k]) < 0.5:
                conn.add(j)
        ld.add(np.asarray(f.desc), np.asarray(f.obs_valid), conn)

    # ground truth revisit: same place (0.35 m), similar heading (<30 deg),
    # at least id_interval ids apart
    def gt_set(k):
        out = []
        for j in range(K):
            if abs(j - k) <= id_interval:
                continue
            if np.linalg.norm(centers[j] - centers[k]) > 0.35:
                continue
            if np.dot(dirs[j], dirs[k]) < np.cos(np.deg2rad(30)):
                continue
            out.append(j)
        return out

    queries = hits = 0
    returned = correct = 0
    for k in range(K):
        gt = gt_set(k)
        if not gt:
            continue
        cand = ld.candidates(k)
        queries += 1
        if any(c in gt for c in cand):
            hits += 1
        for c in cand:
            returned += 1
            # a returned candidate is 'correct' if it is a true revisit at a
            # looser radius (the RANSAC verifier handles the rest)
            ok = (np.linalg.norm(centers[c] - centers[k]) < 0.6
                  and np.dot(dirs[c], dirs[k]) > np.cos(np.deg2rad(45)))
            correct += int(ok)

    assert queries >= 60, f"only {queries} revisit queries in the sequence"
    recall = hits / queries
    precision = correct / max(returned, 1)
    print(f"\nretrieval: {queries} queries, recall@5={recall:.3f}, "
          f"precision={precision:.3f} ({returned} returned)")
    assert recall >= 0.75, f"recall@5 {recall:.3f}"
    assert precision >= 0.60, f"precision {precision:.3f}"
