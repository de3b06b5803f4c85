"""Evaluation statistics — re-derivation of ``/root/reference/audiomae/
util/stat.py`` / ``ast/src/utilities/stats.py`` (host-side, sklearn).

``calculate_stats`` returns per-class dicts with AP, AUC, subsampled
precision/recall and ROC points plus a global argmax accuracy; mAP is the
mean of the per-class APs (``engine_finetune.py:262-266``).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
from scipy import stats as scipy_stats
from sklearn import metrics as skm


def d_prime(auc: float) -> float:
    """stat.py:6-9."""
    return scipy_stats.norm().ppf(auc) * np.sqrt(2.0)


def calculate_stats(
    output: np.ndarray, target: np.ndarray, save_every_steps: int = 1000
) -> List[Dict]:
    classes_num = target.shape[-1]
    acc = skm.accuracy_score(np.argmax(target, 1), np.argmax(output, 1))
    out = []
    for k in range(classes_num):
        avg_precision = skm.average_precision_score(
            target[:, k], output[:, k], average=None
        )
        try:
            auc = skm.roc_auc_score(target[:, k], output[:, k], average=None)
            fpr, tpr, _ = skm.roc_curve(target[:, k], output[:, k])
        except ValueError:  # single-class shard
            auc, fpr, tpr = np.nan, np.array([0.0]), np.array([0.0])
        precisions, recalls, _ = skm.precision_recall_curve(
            target[:, k], output[:, k]
        )
        out.append(
            {
                "precisions": precisions[0::save_every_steps],
                "recalls": recalls[0::save_every_steps],
                "AP": avg_precision,
                "fpr": fpr[0::save_every_steps],
                "fnr": 1.0 - tpr[0::save_every_steps],
                "auc": auc,
                "acc": acc,
            }
        )
    return out


def mean_average_precision(output: np.ndarray, target: np.ndarray) -> float:
    aps = [
        skm.average_precision_score(target[:, k], output[:, k], average=None)
        for k in range(target.shape[-1])
    ]
    return float(np.mean(aps))


def topk_accuracy(output: np.ndarray, target_idx: np.ndarray, ks=(1, 5)):
    """timm.utils.accuracy semantics: percentage in [0, 100]."""
    order = np.argsort(-output, axis=1)
    out = []
    for k in ks:
        correct = (order[:, :k] == target_idx[:, None]).any(axis=1)
        out.append(100.0 * correct.mean())
    return out
