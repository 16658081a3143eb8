"""M7 spell-model guard kernel: the reference's seq2seq safety gates as
pure functions, portable into the iterator-UDF inference stage.

The reference's T5 spell corrector (models/spell_corrector.py:16-189)
is DISABLED in its default path (use_ml_correction=False,
core/processor.py:259) — so model inference stays out of the
correctness path here too. What IS portable, and what a real
deployment must keep byte-identical, is the guard logic around the
model call (spell_corrector.py:96-97, 128-140):

- pre-gate (spell_corrector.py:96): texts longer than 200 chars or
  with fewer than 6 words skip the model (T5 drifts on long inputs,
  wastes beams on short ones);
- service-token reject (spell_corrector.py:128-131): any '<extra_id'
  or empty generation returns the original;
- prompt-prefix strip (spell_corrector.py:134-135): generations that
  echo the task prefix keep only the text after the first ':';
- length-ratio gate (spell_corrector.py:138-140): corrections shorter
  than 0.5x or longer than 2x the original are rejected;
- exception => original (spell_corrector.py:145-147).

`guarded_correct` composes all five around any `model_fn`, so flipping
in a real seq2seq is config-only: pass the model's batch-decode
callable and the gates stay identical.
"""

from __future__ import annotations

from collections.abc import Callable

__all__ = [
    "MAX_ML_LEN",
    "MIN_ML_SPACES",
    "eligible_for_ml",
    "strip_prompt_prefix",
    "accept_correction",
    "guarded_correct",
]

MAX_ML_LEN = 200     # spell_corrector.py:96 — len(text) > 200 skips
MIN_ML_SPACES = 5    # spell_corrector.py:96 — text.count(' ') < 5 skips


def eligible_for_ml(text: str | None) -> bool:
    """Pre-gate: model runs only on mid-length multi-word text."""
    if not text:
        return False
    return len(text) <= MAX_ML_LEN and text.count(" ") >= MIN_ML_SPACES


def strip_prompt_prefix(corrected: str) -> str:
    """T5 generations sometimes echo the task prefix ('исправить: ...');
    keep only the text after the first ':' (spell_corrector.py:134-135)."""
    if ":" in corrected and len(corrected.split(":")) > 1:
        return corrected.split(":", 1)[-1].strip()
    return corrected


def accept_correction(original: str, corrected: str | None) -> str:
    """Post-gates: service-token reject, prefix strip, length-ratio
    bounds. Returns the surviving correction or the original."""
    if corrected is None:
        return original
    if "<extra_id" in corrected or corrected.strip() == "":
        return original
    corrected = strip_prompt_prefix(corrected)
    if len(corrected) < len(original) * 0.5 or len(corrected) > len(original) * 2:
        return original
    return corrected


def guarded_correct(text: str | None,
                    model_fn: Callable[[str], str]) -> str | None:
    """Full M7 guard chain around one model call. `model_fn` is the
    seq2seq decode (prompt construction included); any exception it
    raises degrades to the original text (spell_corrector.py:145-147)."""
    if text is None:
        return None
    if not eligible_for_ml(text):
        return text
    try:
        return accept_correction(text, model_fn(text))
    except Exception:
        return text
