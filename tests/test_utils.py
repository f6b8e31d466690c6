"""Config loading, flatten_dict, profiling, logger, visualizer units."""

import json
import os

import numpy as np

from ucsa_neural_rendering_tpu.config import flatten_dict, load_yaml
from ucsa_neural_rendering_tpu.utils import MetricsLogger, StepTimer
from ucsa_neural_rendering_tpu.utils.profiling import maybe_trace
from ucsa_neural_rendering_tpu.viz import (NYU13_COLOUR_CODE,
                                           NYU40_COLOUR_CODE, NYU40_TO_13,
                                           Visualizer, colorize_label)


def test_flatten_dict():
    d = {"a": {"b": 1, "c": {"d": 2}}, "e": [1, 2], "f": "x"}
    out = flatten_dict(d)
    assert out == {"a.b": 1, "a.c.d": 2, "e": [1, 2], "f": "x"}


def test_load_yaml(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("a: 1\nb:\n  c: [1, 2]\n")
    assert load_yaml(str(p)) == {"a": 1, "b": {"c": [1, 2]}}


def test_metrics_logger(tmp_path):
    lg = MetricsLogger(str(tmp_path))
    lg.log({"x": 1.5}, step=0)
    lg.log({"x": 2.5}, step=1)
    lg.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["x"] == 1.5 and lines[1]["step"] == 1


def test_step_timer(tmp_path):
    p = str(tmp_path / "t.jsonl")
    t = StepTimer(p)
    t.tick("a", epoch=0)
    t.tick("b")
    t.close()
    recs = [json.loads(l) for l in open(p).read().splitlines()]
    assert recs[0]["tag"] == "a" and recs[0]["epoch"] == 0
    assert recs[1]["seconds"] >= 0
    # null timer is a no-op
    t2 = StepTimer(None)
    assert t2.tick("x") >= 0


def test_maybe_trace_disabled():
    with maybe_trace(False, "/nonexistent/should/not/be/created"):
        pass
    assert not os.path.exists("/nonexistent")


def test_palettes():
    assert NYU40_COLOUR_CODE.shape == (41, 3)
    assert NYU13_COLOUR_CODE.shape == (14, 3)
    assert NYU40_TO_13.shape == (41,)
    assert NYU40_TO_13.max() <= 13
    # wall (nyu40 id 1) → nyu13 id 12
    assert NYU40_TO_13[1] == 12


def test_visualizer_writes(tmp_path, rng):
    v = Visualizer(str(tmp_path), store=True)
    img = rng.uniform(0, 1, (16, 20, 3)).astype(np.float32)
    label = rng.integers(0, 41, (16, 20))
    v.plot_image(img, tag="t/img")
    v.plot_segmentation(label, tag="t/seg")
    v.plot_detectron(img, label, tag="t/det")
    files = os.listdir(tmp_path / "t")
    assert len(files) == 3
    col = colorize_label(np.array([[0, 1], [40, 41]]))
    assert col.shape == (2, 2, 3)
    np.testing.assert_array_equal(col[0, 0], [0, 0, 0])


def test_visualizer_image_range_and_shape(rng):
    """plot_image matches the reference's semantics (ref visualizer.py
    plot_image): auto-detect 0-255 vs 0-1 range, raise on non-image shapes
    (round-3 review fixes)."""
    from ucsa_neural_rendering_tpu.viz.visualizer import _to_uint8_image

    img255 = rng.uniform(0, 255, (4, 5, 3)).astype(np.float32)
    img255[0, 0, 0] = 255.0
    out = _to_uint8_image(img255)
    assert out.dtype == np.uint8 and out.max() > 128  # not clipped to ~1

    img01 = rng.uniform(0, 1, (4, 5, 3)).astype(np.float32)
    out01 = _to_uint8_image(img01)
    np.testing.assert_array_equal(
        out01, (np.clip(img01, 0, 1) * 255).astype(np.uint8))

    chw = np.moveaxis(img01, 2, 0)
    np.testing.assert_array_equal(_to_uint8_image(chw), out01)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        _to_uint8_image(np.zeros((4, 5), np.float32))  # depth map, HW


def test_log_image_filenames_never_collide(tmp_path, rng):
    """Repeated image logs of one tag without interleaved scalar logs must
    not overwrite each other (round-3 review fix: per-tag sequence in the
    filename)."""
    lg = MetricsLogger(str(tmp_path))
    img = (rng.uniform(0, 255, (4, 5, 3))).astype(np.uint8)
    lg.log_image("val/frame", img)
    lg.log_image("val/frame", img)
    lg.log_image("val/other", img)
    lg.close()
    files = sorted(os.listdir(tmp_path / "images"))
    assert len(files) == 3 and len(set(files)) == 3
