"""Block quality scoring — the web analogue of the OCR confidence score.

The reference consumes PaddleOCR per-token confidences (``rec_scores``,
/root/reference/ocr/extractors/cni_extractor_18_f.py:59,74-77) as opaque
[0,1] floats. For web pages we synthesise an equivalent per-block quality
signal from length and link density (Boilerpipe-style text-density
heuristic): long, link-free blocks score high; short navigation links
score below the noise threshold (0.3) and get filtered exactly like
low-confidence OCR tokens.

Deterministic and shared by the pure-Python oracle and the Spark parse
UDF: both paths see bit-identical scores (rounded to 4 decimals).
"""

from __future__ import annotations

SCORE_NDIGITS = 4


def block_score(text: str, link_density: float) -> float:
    """Quality score in [0, 1].

    score = (1 - 0.7*link_density) * (0.7 + 0.3*min(1, n/40))

    Like OCR confidences, scores of real text blocks cluster high
    (0.7-1.0) so the downstream proximity binding is distance-dominated
    (ref combined score = ocr_score * 1/(1+dist/100), _18_f.py:333):
    - pure-link nav items ("Home", link_density=1)      -> ~0.22 (< 0.3, noise)
    - short factual tokens ("12.03.2021", "5 min read") -> ~0.78 (valid)
    - names / short values                              -> ~0.79
    - full main-content paragraphs (>= 40 chars)        -> ~1.0  (> 0.7, good)
    """
    n = len(text)
    if n == 0:
        return 0.0
    length_factor = 0.7 + 0.3 * min(1.0, n / 40.0)
    return round((1.0 - 0.7 * link_density) * length_factor, SCORE_NDIGITS)
