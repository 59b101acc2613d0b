"""Pure-Python (non-Spark) oracle of the full quality-filter semantics.

Deliberately structured like the reference's sequential engine
(``backend/app/services/metadata.py:245-714``): a row-at-a-time enrichment
loop followed by an O(n^2) pairwise duplicate scan (gate >= 0.7 then
cosine >= 0.95, ``metadata.py:536``/``:599``).  It shares only *leaf* scorer
functions with the Spark pipeline (langid model, char-LM, scrub bank,
tokenizer, BoW hasher) — the dataflow, grouping, and policy evaluation are
written independently, so the golden test (F1 >= 0.99, scrubbed-transcript
equality) actually cross-checks the Spark DAG.

Intentionally NOT scalable — this is the truth-producer for tests at n in
the low thousands.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..functions.audio import audio_stats
from ..functions.langid import get_model as get_langid
from ..functions.minhash import bow_vector
from ..functions.perplexity import get_model as get_charlm
from ..functions.pii import scrub_text
from ..functions.texthash import tokenize
from ..operators import scoring
from ..operators.dedup import DUP_COS_MIN, DUP_GATE_MIN, LANG_UNKNOWN


def _signals_row(row: dict, run_ts: dt.datetime, langid_model, char_lm) -> dict:
    text = row["transcript"] or ""
    st = audio_stats(row["bytes"], row["codec"])
    lang, conf = langid_model.predict_one(text)
    toks = tokenize(text)
    scrubbed, pii_hits, toxic_hits = scrub_text(text)
    ingest = row["ingest_ts"]
    if isinstance(ingest, pd.Timestamp):
        ingest = ingest.to_pydatetime()
    return {
        "clip_id": row["clip_id"],
        "sr_hz": row["sr_hz"],
        "dur_ms": row["dur_ms"],
        "codec": row["codec"],
        "decode_ok": st.decode_ok,
        "n_samples": st.n_samples,
        "header_sr_hz": st.header_sr_hz,
        "clip_ratio": st.clip_ratio,
        "is_silent": st.is_silent,
        "lang": lang,
        "lang_conf": conf,
        "ppl": char_lm.perplexity_one(text),
        "pii_hits": pii_hits,
        "toxic_hits": toxic_hits,
        "scrubbed_transcript": scrubbed,
        "n_chars": len(text),
        "n_tokens": len(toks),
        "n_distinct": len(set(toks)),
        "alpha_space_ratio": (
            sum(1 for ch in text if ch.isalpha() or ch == " ") / len(text)
            if text
            else 0.0
        ),
        "age_days": (run_ts.date() - ingest.date()).days,
        "_tokens": toks,
    }


def _dup_flags(sig_rows: list[dict]) -> np.ndarray:
    """O(n^2) truth: dup_i iff exists j != i with gate >= 0.7 and cos >= 0.95."""
    n = len(sig_rows)
    langs = [s["lang"] for s in sig_rows]
    toksets = [set(s["_tokens"]) for s in sig_rows]
    bows = np.stack([bow_vector(s["_tokens"]) for s in sig_rows])
    cos = bows @ bows.T  # float32 normalized vectors
    dup = np.zeros(n, dtype=bool)
    cand_i, cand_j = np.nonzero(np.triu(cos >= DUP_COS_MIN, k=1))
    for i, j in zip(cand_i.tolist(), cand_j.tolist()):
        if langs[i] != langs[j] or langs[i] == LANG_UNKNOWN:
            continue
        if not toksets[i] and not toksets[j]:
            continue
        u = len(toksets[i] | toksets[j])
        jac = len(toksets[i] & toksets[j]) / u if u else 0.0
        if 0.5 + 0.5 * jac >= DUP_GATE_MIN:
            dup[i] = dup[j] = True
    return dup


def label_frame(clips: pd.DataFrame, run_ts: dt.datetime) -> pd.DataFrame:
    """clips pandas frame -> expected per-clip results (truth labels)."""
    langid_model, char_lm = get_langid(), get_charlm()
    sig_rows = [
        _signals_row(r, run_ts, langid_model, char_lm)
        for r in clips.to_dict("records")
    ]
    dup = _dup_flags(sig_rows)
    out = []
    for s, is_dup in zip(sig_rows, dup.tolist()):
        s = dict(s)
        s["is_dup"] = is_dup
        scores = scoring.py_dimension_scores(s)
        overall = scoring.py_overall(scores)
        action = scoring.py_action(overall)
        out.append(
            {
                "clip_id": s["clip_id"],
                **{f"score_{k}": v for k, v in scores.items()},
                "is_dup": is_dup,
                "overall_quality_score": overall,
                "recommended_action": action,
                "keep": action == "KEEP",
                "scrubbed_transcript": s["scrubbed_transcript"],
            }
        )
    return pd.DataFrame(out)
