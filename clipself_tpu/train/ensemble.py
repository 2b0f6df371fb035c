"""Student-teacher weight ensembling on save.

Reference: `student_teacher_ensemble(s, t, alpha) = alpha*s + (1-alpha)*t`
per tensor (`src/training/train.py:53-59`), applied at checkpoint time with
alpha=0.7 (B/16) / 0.95 (L/14) (`main.py:280-298`).
"""

from __future__ import annotations

from typing import Any

import jax


def student_teacher_ensemble(student: Any, teacher: Any, alpha: float) -> Any:
    return jax.tree.map(lambda s, t: alpha * s + (1.0 - alpha) * t, student, teacher)
