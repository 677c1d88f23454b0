"""Golden-image regression: the canonical scene must render identically
across refactors (CPU, fixed seeds). Regenerate the fixture only for an
intentional change in rendering semantics:

    python - <<'PY'
    # see the snippet in the fixture-generation history (tests/golden/)
    PY
"""

import io
import os

import numpy as np

from tracer.render import camera as C
from tracer.render import renderer
from tracer.scene import builders, config

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "canonical_32x24_spp4_d5.npz")


def test_canonical_scene_matches_golden():
    params = config.read_scene_params(io.StringIO(config.smoke_config_text()))
    scene = builders.create_scene(params, texture_loader=lambda _: None)
    lookfrom, lookat = C.camera_path_position(params.camera_path, 0, params.num_frames)
    cam = C.build_camera_data(lookfrom, lookat, 32, 24, params.fov_degrees)
    fb = np.asarray(renderer.render_frame(scene, cam, 32, 24, spp=4, max_depth=5, chunk=768))
    want = np.load(GOLDEN)["fb"]
    np.testing.assert_allclose(fb, want, rtol=1e-4, atol=1e-5)
