"""Corrections sink — learn a misread character as a new template.

Re-creation of OpencvTranslator.learnChar/add
(/root/reference/src/opencvTranslator.ts:105-116): the 36x36 crop of a
corrected character is appended to the match-element list under its
true label, so subsequent classifications can match it directly.

On Spark, template mutation is batch-level, not per-row: corrections
collected in one batch are folded into the broadcast template pack
between jobs (the reference's corrections dir analog, loaded at init —
src/opencvTranslator.ts:83-103).
"""

from __future__ import annotations

import numpy as np

from ..operators.classify import TemplateSet


def learn_char(templates: TemplateSet, glyph36: np.ndarray,
               value: str) -> TemplateSet:
    """Return a new TemplateSet with the glyph appended under `value`."""
    g = glyph36.astype(np.float64)
    tensor = np.concatenate([templates.tensor, g[None, :, :]])
    norms = np.concatenate([
        templates.norms, [np.sqrt(float((g * g).sum()))]])
    return TemplateSet(tensor=tensor, values=[*templates.values, value],
                       norms=norms)
