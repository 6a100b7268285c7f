"""Scanner action DSL — the reference's declarative mini-language.

Re-creation of /root/reference/src/scanner.ts: a scanner is constructed
from a list of actions ``[{"type": "gray"}, {"type": "deskew"}, ...]``
validated against a descriptor table at CONSTRUCTION time (unknown
type, unknown key, and missing required key all raise), then
interpreted sequentially at scan time.  This is the reference's closest
thing to a query language: parse/validate at plan time, interpret at
run time, no optimization.

The CardScanner analog (src/cardScanner.ts:13-47) demonstrates a second
product on the same engine: a digit-strip scanner built purely from DSL
actions plus the template classifier.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import numpy as np

from ..operators import kernels as K


@dataclass
class ScannerContext:
    img: np.ndarray
    results: dict = field(default_factory=dict)


def _act_gray(ctx: ScannerContext, action: dict) -> None:
    ctx.img = K.grayscale(ctx.img)


def _act_deskew(ctx: ScannerContext, action: dict) -> None:
    from .scan import skew_angle
    angle = skew_angle(ctx.img)
    if angle != 0:
        ctx.img = K.rotate(ctx.img, angle)


def _act_blur(ctx: ScannerContext, action: dict) -> None:
    ctx.img = K.gaussian_blur(ctx.img, action.get("dimension", 3))


def _act_threshold(ctx: ScannerContext, action: dict) -> None:
    ctx.img = K.otsu_binary_inv(ctx.img)


def _act_adaptive_threshold(ctx: ScannerContext, action: dict) -> None:
    ctx.img = K.adaptive_threshold_gaussian_inv(
        ctx.img, action.get("blockSize", 19), action.get("C", 1))


def _act_erode(ctx: ScannerContext, action: dict) -> None:
    ctx.img = K.erode(ctx.img, action.get("width", 2),
                      action.get("height", 2),
                      action.get("iterations", 1))


def _act_dilate(ctx: ScannerContext, action: dict) -> None:
    ctx.img = K.dilate(ctx.img, action.get("width", 2),
                       action.get("height", 2),
                       action.get("iterations", 1))


def _act_crop(ctx: ScannerContext, action: dict) -> None:
    ctx.img = K.crop_fraction(
        ctx.img,
        begin_h=action.get("beginHeight", 0.0),
        end_h=action.get("endHeight", 1.0),
        begin_w=action.get("beginWidth", 0.0),
        end_w=action.get("endWidth", 1.0))


def _act_invert(ctx: ScannerContext, action: dict) -> None:
    ctx.img = K.bitwise_not(ctx.img)


# descriptor table: required/optional keys per action type
# (reference: src/scanner.ts:96-111); "type" itself is always allowed
ACTION_DESCRIPTORS: dict[str, dict] = {
    "gray": {"fcn": _act_gray},
    "deskew": {"fcn": _act_deskew},
    "blur": {"fcn": _act_blur, "optional": ["dimension"]},
    "threshold": {"fcn": _act_threshold},
    "adaptivethreshold": {"fcn": _act_adaptive_threshold,
                          "optional": ["blockSize", "C"]},
    "erode": {"fcn": _act_erode,
              "optional": ["width", "height", "iterations"]},
    "dilate": {"fcn": _act_dilate,
               "optional": ["width", "height", "iterations"]},
    "crop": {"fcn": _act_crop,
             "optional": ["beginHeight", "endHeight",
                          "beginWidth", "endWidth"]},
    "invert": {"fcn": _act_invert},
}


class Scanner:
    """Validate-at-plan-time, interpret-at-run-time action pipeline."""

    def __init__(self, actions: list[dict]):
        self.actions = actions
        self._validate(actions)

    @staticmethod
    def _validate(actions: list[dict]) -> None:
        valid = sorted(ACTION_DESCRIPTORS)
        for i, action in enumerate(actions):
            t = str(action.get("type", "")).lower()
            desc = ACTION_DESCRIPTORS.get(t)
            if desc is None:
                raise ValueError(
                    f"'{t}' is not a valid action type in action {i + 1}; "
                    f"expecting one of {valid}")
            allowed = set(desc.get("required", [])) | \
                set(desc.get("optional", [])) | {"type"}
            for key in action:
                if key not in allowed:
                    raise ValueError(
                        f"'{key}' is an unknown property for action {i + 1}")
            for key in desc.get("required", []):
                if key not in action:
                    raise ValueError(
                        f"action {i + 1} is missing property '{key}' which "
                        f"is required for action type '{t}'")

    def scan(self, img: np.ndarray) -> np.ndarray:
        ctx = ScannerContext(img=img)
        for action in self.actions:
            t = str(action["type"]).lower()
            ACTION_DESCRIPTORS[t]["fcn"](ctx, action)
        return ctx.img

    def transform(self) -> Callable[[np.ndarray], np.ndarray]:
        return self.scan


class DigitStripScanner:
    """CardScanner analog: a second product on the same engine — scan a
    horizontal strip of digits (e.g. a card/account number) using DSL
    preprocessing plus the template classifier."""

    DEFAULT_ACTIONS = [
        {"type": "gray"},
        {"type": "deskew"},
        {"type": "blur", "dimension": 3},
        {"type": "adaptiveThreshold", "blockSize": 19, "C": 1},
    ]

    def __init__(self, actions: list[dict] | None = None, templates=None):
        # DSL types are case-insensitive like the reference's
        self.scanner = Scanner([{**a, "type": a["type"].lower()}
                                for a in (actions or self.DEFAULT_ACTIONS)])
        if templates is None:
            from .scan import get_default_templates
            templates = get_default_templates()
        self.templates = templates

    def scan(self, img: np.ndarray) -> str:
        from ..operators.classify import ncc_scores_batch
        binary = self.scanner.scan(img)
        regions = K.find_regions(binary)
        regions = K.filter_regions(regions, min_width=3, min_height=7,
                                   min_area=20)
        if not regions:
            return ""
        crops = np.zeros((len(regions), 36, 36))
        for i, r in enumerate(regions):
            x, y, w, h = r.rect
            crops[i] = K.resize_area(binary[y:y + h, x:x + w],
                                     (36, 36)).astype(np.float64)
        scores = ncc_scores_batch(crops, self.templates)
        best = scores.argmax(axis=1)
        return "".join(self.templates.values[b] for b in best)
