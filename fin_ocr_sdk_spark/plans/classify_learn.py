"""Corrections sink — learn a misread character as a new template,
and persist it so later jobs classify with it.

Re-creation of OpencvTranslator.learnChar/add
(/root/reference/src/opencvTranslator.ts:105-116): the 36x36 crop of a
corrected character is appended to the match-element list under its
true label, so subsequent classifications can match it directly.

Persistence keeps the reference's on-disk corrections format
(src/opencvTranslator.ts:83-103): a directory of ``<name>.tif`` glyph
images paired with ``<name>.ct`` files holding ``value:numContours``.
On Spark the dir is loaded ONCE per executor at template-pack init
(plans.scan.get_default_templates) and folded into the broadcast
TemplateSet — the init-once translator pattern of src/ocr.ts:44-56.
Local mode inherits ``OCR_CORRECTIONS_DIR`` from the driver process;
on a real cluster set it per executor
(``spark.executorEnv.OCR_CORRECTIONS_DIR``) and point it at a path all
executors can read (the corrections dir on shared storage).
Writes are tmp+atomic-rename (.ct last, so a half-written pair is
never loaded), making concurrent executor writers safe on any
rename-atomic store.
"""

from __future__ import annotations

import os
import uuid

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


def save_correction(corrections_dir: str, glyph: np.ndarray, value: str,
                    num_contours: int = 1, name: str | None = None) -> str:
    """Persist one learned glyph as the reference's ``.tif`` + ``.ct``
    pair (src/opencvTranslator.ts:83-103 reads exactly this layout).
    The glyph may be any size — load resizes to 36x36 like
    learnChar's resize (src/opencvTranslator.ts:106).  Returns the
    pair's base name."""
    from ..sources import codecs
    os.makedirs(corrections_dir, exist_ok=True)
    name = name or f"corr-{uuid.uuid4().hex[:12]}"
    tif = os.path.join(corrections_dir, f"{name}.tif")
    ct = os.path.join(corrections_dir, f"{name}.ct")
    for path, payload in ((tif, codecs.encode_tiff(
                               glyph.astype(np.uint8))),
                          (ct, f"{value}:{num_contours}".encode())):
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)  # .ct renamed last = pair committed
    return name


def load_corrections(corrections_dir: str
                     ) -> list[tuple[str, np.ndarray, int]]:
    """All committed corrections as (value, glyph36, num_contours),
    in sorted-name order (deterministic fold order across executors).
    Mirrors loadCorrections: a ``.tif`` without its ``.ct`` is skipped
    (src/opencvTranslator.ts:89-93 warns and continues)."""
    from ..operators import kernels as K
    from ..sources import codecs
    out: list[tuple[str, np.ndarray, int]] = []
    if not os.path.isdir(corrections_dir):
        return out
    for fn in sorted(os.listdir(corrections_dir)):
        if not fn.endswith(".tif"):
            continue
        ct = os.path.join(corrections_dir, fn[:-4] + ".ct")
        if not os.path.exists(ct):
            continue  # uncommitted half-pair
        with open(os.path.join(corrections_dir, fn), "rb") as f:
            img = codecs.decode_image(f.read(), "tiff")
        with open(ct, "rb") as f:
            value, _, n = f.read().decode().partition(":")
        glyph = K.resize_area(img, (36, 36)).astype(np.uint8)
        out.append((value, glyph, int(n or 1)))
    return out


def fold_corrections(templates: TemplateSet,
                     corrections_dir: str) -> TemplateSet:
    """Broadcast-pack init: base templates + every persisted
    correction appended in deterministic order."""
    for value, glyph, _ in load_corrections(corrections_dir):
        templates = learn_char(templates, glyph, value)
    return templates
