"""Scheduled-sampling probability schedule.

Reference: inverse-sigmoid k/(k + e^(i/k)), k=140 (train_utils.py:11-20), applied
per epoch as model.teacher_force_prob (train.py:109-112,145). When
schedule_sample is off the probability is a constant 1.0 (full teacher forcing).
"""

from __future__ import annotations

import numpy as np


def inverse_sigmoid(length: int, k: float = 140.0) -> np.ndarray:
    return k / (k + np.exp(np.arange(length) / k))


def teacher_force_schedule(epochs: int, schedule_sample: bool) -> np.ndarray:
    if schedule_sample:
        return inverse_sigmoid(epochs)
    return np.ones(epochs)
