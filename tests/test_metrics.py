"""SemanticsMeter vs sklearn oracle (ref semantics: nr4seg/utils/metrics.py)."""

import numpy as np
import pytest
from sklearn.metrics import confusion_matrix as sk_confusion_matrix

from ucsa_neural_rendering_tpu.metrics import (SemanticsMeter,
                                               measure_from_confmat)


def _reference_measure(conf_mat):
    """Literal re-implementation of the reference metric math for testing."""
    conf_mat = conf_mat.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        norm = np.transpose(np.transpose(conf_mat) / conf_mat.sum(axis=1))
    missing = np.isnan(norm.sum(1))
    existing = ~missing
    diag = np.diagonal(norm)
    m_acc = np.ma.masked_array(diag, np.isnan(diag)).mean()
    total_acc = np.sum(np.diagonal(conf_mat)) / np.sum(conf_mat)
    n = conf_mat.shape[0]
    ious = np.zeros(n)
    for c in range(n):
        denom = conf_mat[c, :].sum() + conf_mat[:, c].sum() - conf_mat[c, c]
        ious[c] = conf_mat[c, c] / denom if denom > 0 else 0.0
    return np.mean(ious[existing]), total_acc, float(m_acc)


@pytest.mark.parametrize("num_classes", [5, 40])
def test_meter_matches_sklearn(rng, num_classes):
    meter = SemanticsMeter(num_classes)
    total = np.zeros((num_classes, num_classes), dtype=np.int64)
    for _ in range(3):
        truths = rng.integers(-1, num_classes, size=(2, 17, 23))
        preds = rng.integers(0, num_classes, size=(2, 17, 23))
        meter.update(preds, truths)
        t, p = truths.ravel(), preds.ravel()
        valid = t != -1
        total += sk_confusion_matrix(t[valid], p[valid],
                                     labels=list(range(num_classes)))
    np.testing.assert_array_equal(np.asarray(meter.conf_mat), total)

    miou, tacc, macc = meter.measure()
    r_miou, r_tacc, r_macc = _reference_measure(total)
    assert abs(miou - r_miou) < 1e-12
    assert abs(tacc - r_tacc) < 1e-12
    assert abs(macc - r_macc) < 1e-12


def test_meter_missing_classes(rng):
    # classes absent from ground truth must not dilute mIoU
    meter = SemanticsMeter(4)
    truths = np.array([0, 0, 1, 1, -1])
    preds = np.array([0, 1, 1, 3, 2])
    meter.update(preds, truths)
    miou, tacc, macc = meter.measure()
    conf = np.asarray(meter.conf_mat)
    assert conf.sum() == 4  # ignore pixel dropped
    ref = _reference_measure(conf)
    assert abs(miou - ref[0]) < 1e-12
    # only classes 0 and 1 exist
    iou0 = 1 / 2  # tp=1, row=2, col=1
    iou1 = 1 / 3  # tp=1, row=2, col=2
    assert abs(miou - (iou0 + iou1) / 2) < 1e-12


def test_measure_from_confmat_all_correct():
    conf = np.diag([5, 3, 2])
    miou, tacc, macc = measure_from_confmat(conf)
    assert miou == 1.0 and tacc == 1.0 and macc == 1.0


def test_meter_accumulates_past_int32():
    """Accumulation crosses int32 territory safely: device windows stay
    small (int32-safe per the _FOLD_EVERY contract) and fold into a host
    int64 total, so a 25k-scale eval (~10^10 pixels) can't wrap a cell
    (round-3 review finding). Dispatch stays lazy between folds."""
    from ucsa_neural_rendering_tpu.metrics import SemanticsMeter
    meter = SemanticsMeter(2)
    per_update = 2 ** 24
    n = 200  # total 200 * 2^24 = 3.36e9 > 2^31, spread over ~7 folds
    big = np.array([[per_update, 0], [0, 5]], dtype=np.int32)
    for _ in range(n):
        meter.update_confmat(big)
    assert meter.conf_mat[0, 0] == n * per_update  # no wraparound
    miou, tacc, macc = meter.measure()
    assert 0.99 < tacc <= 1.0
