"""Translator engine registry — the reference's extensibility point.

Re-creation of /root/reference/src/translators.ts:36-115: engines are
selected by the ``translators`` config CSV; invalid names are rejected
with the reference's error contract.  The 'opencv' engine (our batched
template-NCC classifier) is always constructed and self-contained; the
'tesseract' engine requires an external binary and is gated behind an
import-try (default OFF in Config, matching this environment).

Each engine is a callable ``(line, opts) -> TranslateResult``; when
several are enabled, ``translate_all`` returns a result per engine
keyed by name (the reference's TranslatorsResult map).
"""

from __future__ import annotations

from collections.abc import Callable

from ..config import Config
from ..operators.classify import TemplateSet, TranslateResult, translate_line
from ..operators.segment import Line

VALID_NAMES = ("tesseract", "opencv")


class OpencvEngine:
    name = "opencv"

    def __init__(self, templates: TemplateSet | None = None,
                 cfg: Config | None = None):
        self.templates = templates or TemplateSet.build()
        self.cfg = cfg or Config()

    def translate(self, line: Line, correct: bool = False,
                  actual: str | None = None) -> TranslateResult:
        result = translate_line(line, self.templates,
                                self.cfg.max_translator_choices)
        if correct and actual is not None:
            result = self._apply_corrections(line, result, actual)
        return result

    def _apply_corrections(self, line: Line, result: TranslateResult,
                           actual: str) -> TranslateResult:
        """Supervised correction (src/opencvTranslator.ts:131-139,
        226-242): when the expected string is provided and lengths
        match, mismatched characters are learned as new templates."""
        chars = line.get_chars()
        if len(actual) != len(chars):
            return result  # reference disables correction on length skew
        from ..operators import kernels as K
        from .classify_learn import learn_char  # noqa: F401 (see below)
        value = list(result.value)
        for i, (got, want) in enumerate(zip(result.value, actual)):
            if got != want:
                c = chars[i]
                x, y, w, h = c.rect
                crop = line.image[y:y + h, x:x + w]
                glyph = K.resize_area(crop, (36, 36))
                self.templates = learn_char(self.templates, glyph, want)
                value[i] = want
        return TranslateResult(value="".join(value), score=result.score,
                               char_choices=result.char_choices)


class TesseractEngine:
    """External-binary engine (reference: src/tesseractTranslator.ts).
    Stubbed: no tesseract binary/model in this environment; the
    registry contract (selection, rejection, fan-out) is fully real."""

    name = "tesseract"

    def __init__(self):
        try:
            import pytesseract  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "tesseract engine requires pytesseract + a tesseract "
                "binary with the micr_e13b model; not available in this "
                "environment (enable via OCR_TRANSLATORS=opencv)") from e

    def translate(self, line: Line, **_):  # pragma: no cover
        raise NotImplementedError


def build_engines(cfg: Config | None = None,
                  templates: TemplateSet | None = None) -> dict[str, object]:
    """Parse cfg.translators CSV; reject invalid names exactly like the
    reference (src/translators.ts:81-83)."""
    cfg = cfg or Config()
    engines: dict[str, object] = {}
    opencv = OpencvEngine(templates, cfg)
    for name in cfg.translators.split(","):
        name = name.strip()
        if name == "opencv":
            engines[name] = opencv
        elif name == "tesseract":
            engines[name] = TesseractEngine()
        else:
            raise ValueError(
                f"Invalid translator name '{name}' found in "
                "OCR_TRANSLATORS environment variable; valid values are "
                "'tesseract' and 'opencv' with a comma separator")
    return engines


def translate_all(engines: dict[str, object], line: Line,
                  **opts) -> dict[str, TranslateResult]:
    """Fan out one line to every enabled engine (src/translators.ts:98-115)."""
    return {name: eng.translate(line, **opts)
            for name, eng in engines.items()}


class TesseractFullPageEngine:
    """Full-page OCR engine for the check-number fallback (reference:
    src/tesseractTranslator.ts full-page mode, enabled alongside the
    tesseract line engine).  Stubbed behind the same import gate; any
    object with ``translate_image(gray) -> str`` satisfies the protocol
    (tests inject a fake)."""

    name = "tesseract-full-page"

    def __init__(self):
        try:
            import pytesseract  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "full-page tesseract engine requires pytesseract + a "
                "tesseract binary; not available in this environment"
            ) from e

    def translate_image(self, gray) -> str:  # pragma: no cover
        raise NotImplementedError


def build_full_page_engine(cfg: Config | None = None):
    """The reference constructs tesseractFullPage only when the
    tesseract translator is enabled (src/ocr.ts); absent binary →
    None, and the fallback silently no-ops (src/check.ts:148-152)."""
    cfg = cfg or Config()
    if "tesseract" not in cfg.translators:
        return None
    try:
        return TesseractFullPageEngine()
    except ImportError:
        return None


def search_check_number_if_missing(results: dict, full_page_engine,
                                   full_image) -> dict:
    """Full-page check-number fallback
    (src/check.ts:129-177 searchForCheckNumberIfNotFoundOnMicrLine):
    if NO translator found a check number, OCR the whole page, find the
    line after "Check No", parse a number from it, and fill it into
    every translator's result.  Returns the (possibly updated) result
    map; CheckInfo is immutable here so updated entries are replaced."""
    import dataclasses

    from ..functions.micr import check_number_from_full_page
    for info in results.values():
        if info.check_number:
            return results  # found on the MICR line — nothing to do
    if not results or full_page_engine is None or full_image is None:
        return results
    text = full_page_engine.translate_image(full_image)
    check_num = check_number_from_full_page(text)
    if not check_num:
        return results
    return {name: dataclasses.replace(info, check_number=check_num)
            for name, info in results.items()}


Registry = Callable  # documentation alias
