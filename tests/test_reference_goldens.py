"""Golden parity against the reference's own shipped screenshots
(/root/reference/images/screenshot_{cube,obj,map}.png — SURVEY §4 "examples
as acceptance tests", VERDICT r1 missing #1).

Two layers:
  * drift tests — re-render each example scene and compare against the
    committed golden PNG (tests/goldens/) almost exactly; any pipeline
    change that moves pixels fails here first;
  * structure tests — compare silhouette/edge positions, gradient
    monotonicity, and per-region hue relations against the reference
    screenshots (see golden_metrics.py for why only structural properties
    are comparable).
"""

import os

import numpy as np
import pytest

from .golden_metrics import (
    MAP_REGIONS,
    gradient_monotonic_share,
    load_rgb,
    object_bbox,
    region_mean,
    sky_share,
)
from .golden_scenes import BUILDERS, REF_ROOT, have_reference

W, H = 656, 406
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

pytestmark = pytest.mark.skipif(
    not have_reference(), reason="reference checkout not available"
)

_cache = {}


def render(name):
    if name not in _cache:
        rast, scene, assets = BUILDERS[name](W, H)
        _cache[name] = rast.rasterize(scene, W, H, 40, assets)
    return _cache[name]


def ref_shot(name):
    return load_rgb(
        os.path.join(REF_ROOT, "images", f"screenshot_{name}.png"), crop_chrome=True
    )


@pytest.mark.parametrize("name", ["cube", "obj", "map"])
def test_golden_drift(name):
    from PIL import Image

    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        # self-seed: first run on a fresh checkout writes the golden (the
        # PNGs are committed via a .gitignore negation; if one goes missing
        # the test must not silently pass against its own output)
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        Image.fromarray(render(name)).save(path)
        pytest.skip(f"golden {name}.png was missing — seeded from this render")
    golden = np.asarray(Image.open(path).convert("RGBA")).astype(np.int32)
    frame = render(name).astype(np.int32)
    assert np.abs(frame - golden).max() <= 2, (
        f"{name} render drifted from committed golden "
        f"(max diff {np.abs(frame - golden).max()})"
    )


@pytest.mark.parametrize("name", ["cube", "obj"])
def test_object_structure_vs_reference(name):
    ref = ref_shot(name)
    ours = render(name)[..., :3].astype(np.float32)

    rb = object_bbox(ref)
    ob = object_bbox(ours)
    assert rb is not None and ob is not None

    # silhouette center within 12% of the frame (the reference camera angle
    # came from a live mouse hover; exact extents cannot match)
    rc = ((rb[0] + rb[1]) / 2, (rb[2] + rb[3]) / 2)
    oc = ((ob[0] + ob[1]) / 2, (ob[2] + ob[3]) / 2)
    assert abs(rc[0] - oc[0]) < 0.12, (rb, ob)
    assert abs(rc[1] - oc[1]) < 0.15, (rb, ob)

    # comparable silhouette area (ratio bounded, not equal)
    ra = (rb[1] - rb[0]) * (rb[3] - rb[2])
    oa = (ob[1] - ob[0]) * (ob[3] - ob[2])
    assert 0.3 < oa / ra < 3.0, (rb, ob)

    # the VGrayGradient background grows downward in both renders
    assert gradient_monotonic_share(ref) > 0.9
    assert gradient_monotonic_share(ours) > 0.9


def test_map_structure_vs_reference():
    ref = ref_shot("map")
    ours = render("map")[..., :3].astype(np.float32)

    for img in (ref, ours):
        sky = region_mean(img, *MAP_REGIONS["sky"])
        floor = region_mean(img, *MAP_REGIONS["floor"])
        brick = region_mean(img, *MAP_REGIONS["brick_wall"])
        fence = region_mean(img, *MAP_REGIONS["fence_wall"])
        # sky texture is warm (r >> b)
        assert sky[0] - sky[2] > 15, sky
        # brickfloor is green-leaning (g > r)
        assert floor[1] - floor[0] > 2, floor
        # brickwall is warm (r > b)
        assert brick[0] - brick[2] > 10, brick
        # the fence wall is darker than the sky
        assert fence.mean() < sky.mean(), (fence, sky)

    # sky occupies a comparable share of the upper center band
    assert abs(sky_share(ref) - sky_share(ours)) < 0.2
