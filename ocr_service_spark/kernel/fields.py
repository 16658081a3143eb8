"""Field extraction + validation kernel (pytest oracle).

Pure-Python reimplementation of the reference's critical-field
validators (reference core/validators.py:25-76): per-field regex find,
whitespace-normalize, validity lambda, confidence 0.9/0.5
(core/validators.py:113). The production Spark path expresses the same
rules as native column expressions (ocr_service_spark.operators.validate)
so they stay inside whole-stage codegen; this module exists so pytest can
assert the two agree token-for-token on the synthetic corpus.
"""

from __future__ import annotations

import re

__all__ = ["FIELD_PATTERNS", "find_field", "validate_fields", "extract_important_data"]


def _digits(x: str) -> str:
    return re.sub(r"\D", "", x)


# (pattern, validation) per field — reference core/validators.py:25-76.
FIELD_PATTERNS: dict[str, tuple[str, object]] = {
    "ogrn": (r"\b\d{13,15}\b", lambda x: len(_digits(x)) in (13, 15)),
    "inn": (r"\b\d{10,12}\b", lambda x: len(_digits(x)) in (10, 12)),
    "kpp": (r"\b\d{9}\b", lambda x: len(_digits(x)) == 9),
    "date": (
        r"\b\d{1,2}[./-]\d{1,2}[./-]\d{2,4}\b",
        lambda x: bool(re.match(r"\d{1,2}[./-]\d{1,2}[./-]\d{2,4}", x)),
    ),
    "snils": (r"\b\d{3}-\d{3}-\d{3}\s\d{2}\b|\b\d{11}\b", lambda x: len(_digits(x)) == 11),
    "phone": (
        r"[+7]?\s*\(?\d{3}\)?\s*\d{3}[-.\s]?\d{2}[-.\s]?\d{2}",
        lambda x: len(_digits(x)) >= 10,
    ),
    "email": (
        r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b",
        lambda x: "@" in x and "." in x.split("@")[1],
    ),
}

_COMPILED = {
    name: re.compile(pat, re.IGNORECASE | re.UNICODE)
    for name, (pat, _) in FIELD_PATTERNS.items()
}

_WS_RE = re.compile(r"\s+")


def find_field(field_name: str, text: str) -> list[tuple[str, float]]:
    """findall → normalize → validate → confidence 0.9/0.5
    (reference core/validators.py:85-117)."""
    pat = _COMPILED[field_name]
    _, validator = FIELD_PATTERNS[field_name]
    out = []
    for m in pat.findall(text):
        cleaned = _WS_RE.sub(" ", str(m).strip())
        out.append((cleaned, 0.9 if validator(cleaned) else 0.5))
    return out


def validate_fields(text: str, fields: list[str] | None = None) -> dict[str, dict]:
    """Best candidate per field = argmax by confidence, first match wins
    ties (reference core/validators.py:186-191 — W1 of SURVEY.md)."""
    result: dict[str, dict] = {}
    for name in fields or list(FIELD_PATTERNS):
        found = find_field(name, text)
        if found:
            best = max(found, key=lambda t: t[1])  # stable: first max
            result[name] = {
                "field_name": name,
                "value": best[0],
                "valid": best[1] >= 0.9,
                "confidence": best[1],
            }
        else:
            result[name] = {
                "field_name": name,
                "value": "",
                "valid": False,
                "confidence": 0.0,
            }
    return result


_SURNAME_PATTERNS = [
    r"\b[А-ЯЁ][а-яё]{2,}\b(?=\s+[А-ЯЁ]\.\s*[А-ЯЁ]\.)",
    r"\b[А-ЯЁ][а-яё]{2,}\b(?=\s+[А-ЯЁ][а-яё]+\s+[А-ЯЁ][а-яё]+)",
    r"[А-ЯЁ][а-яё]{3,}(?=\s+[А-ЯЁ]\.)",
]
_SURNAME_STOPWORDS = {
    "россия", "российская", "федерация", "республика", "область", "край",
}


def extract_important_data(text: str) -> dict[str, list[str]]:
    """inn/snils/surnames lists (reference core/validators.py:213-250).
    Surname union over three patterns is kept ORDER-DETERMINISTIC
    (sorted) unlike the reference's set() iteration — required for
    distributed byte-identity (SURVEY.md §7 "what's hard")."""
    data = {
        "inn": [v for v, _ in find_field("inn", text)],
        "snils": [v for v, _ in find_field("snils", text)],
    }
    found: set[str] = set()
    for pat in _SURNAME_PATTERNS:
        for m in re.findall(pat, text):
            if len(m) >= 3 and m[0].isupper() and m.lower() not in _SURNAME_STOPWORDS:
                found.add(m)
    data["surnames"] = sorted(found)[:10]
    return data
