"""Deterministic Common-Crawl-style web-page table (the north-rule input).

Schema exactly per BASELINE.json ``input_hint``::

    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

Properties engineered for the pipeline's scale tests:

- **Determinism**: every row is a pure function of ``(seed, doc_id)`` — the
  same table materializes regardless of partitioning, task retries, or
  cluster size, so the local[8]-vs-local[32] scaling runs and resume-from-
  checkpoint see byte-identical input.
- **Skew**: domains are Zipf(s≈1.1) — a head domain owns a large share of
  urls, exercising the salted-merge path exactly like real web crawls.
- **Token Zipf**: document tokens are drawn Zipf from a closed vocabulary so
  CMS/HLL error bounds can be asserted against exact counts.
- **Byte-identical extraction invariant** (input_hint): ``text`` equals
  ``extract_text(html)`` exactly; ``extract_text`` is a pure function and a
  test pins the round-trip byte-for-byte.
- **Distributed generation**: ``generate_webpages`` builds rows inside
  ``mapInPandas`` over ``spark.range`` — each task generates only its id
  range; nothing is funneled through the driver, so the generator itself
  scales to arbitrary row counts.

The reference has no data generator; its tests hand-roll tiny matrices
(spark/src/test/.../cf/SimilarityAnalysisSuite.scala:52-72). This module is
the web-scale stand-in the north rule requires.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

LANGS = ["en", "de", "fr", "es", "it"]
LANG_WEIGHTS = np.array([0.55, 0.15, 0.12, 0.10, 0.08])
N_DOMAINS = 1000
DOMAIN_ZIPF_S = 1.1
VOCAB_SIZE = 20_000
TOKEN_ZIPF_S = 1.2
MEAN_TOKENS = 120

_EPOCH_2020 = 1577836800  # 2020-01-01T00:00:00Z


def _zipf_probs(n: int, s: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


# Module-level caches; pure functions of constants.
_DOMAIN_P = _zipf_probs(N_DOMAINS, DOMAIN_ZIPF_S)
_TOKEN_P = _zipf_probs(VOCAB_SIZE, TOKEN_ZIPF_S)
VOCAB = np.array([f"tok{i}" for i in range(VOCAB_SIZE)])


def _rng_for(seed: int, doc_id: int) -> np.random.Generator:
    # Independent stream per (seed, doc) — partitioning-invariant.
    return np.random.default_rng(np.random.SeedSequence([seed, doc_id]))


def _render_html(title: str, body: str) -> bytes:
    return (f"<html><head><title>{title}</title>"
            f"<script>var x=1;</script></head>"
            f"<body><p>{body}</p></body></html>").encode("utf-8")


def extract_text(html: bytes) -> str:
    """Pure extraction: title + body text of the generator's template.

    Byte-identical per url by construction (input_hint invariant). Real
    crawl HTML would swap in a proper parser here; the contract — pure
    function of the html bytes, no ambient state — is what matters for
    retry-safety and the two-cluster determinism evidence.
    """
    s = html.decode("utf-8", errors="replace")
    t0 = s.find("<title>")
    t1 = s.find("</title>")
    title = s[t0 + 7:t1] if 0 <= t0 < t1 else ""
    b0 = s.find("<p>")
    b1 = s.rfind("</p>")
    body = s[b0 + 3:b1] if 0 <= b0 < b1 else ""
    return f"{title} {body}".strip()


def _gen_rows(ids: np.ndarray, seed: int) -> pd.DataFrame:
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_id in ids:
        rng = _rng_for(seed, int(doc_id))
        domain = int(rng.choice(N_DOMAINS, p=_DOMAIN_P))
        lang = LANGS[int(rng.choice(len(LANGS), p=LANG_WEIGHTS))]
        n_tok = max(5, int(rng.poisson(MEAN_TOKENS)))
        toks = VOCAB[rng.choice(VOCAB_SIZE, size=n_tok, p=_TOKEN_P)]
        title = f"page {doc_id} {lang}"
        body = " ".join(toks.tolist())
        html = _render_html(title, body)
        urls.append(f"https://d{domain}.example.com/p/{doc_id}")
        tss.append(_EPOCH_2020 + int(doc_id) % 31_536_000)
        htmls.append(html)
        texts.append(extract_text(html))
        langs.append(lang)
    return pd.DataFrame({
        "url": urls,
        "warc_ts": pd.to_datetime(np.array(tss, dtype="int64"), unit="s"),
        "html": htmls,
        "text": texts,
        "lang": langs,
    })


def webpages_pandas(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Small-scale driver-side generation (tests)."""
    return _gen_rows(np.arange(n_docs, dtype=np.int64), seed)


WEBPAGE_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                  "text string, lang string")


def generate_webpages(spark, n_docs: int, seed: int = 42,
                      partitions: int | None = None):
    """Distributed deterministic generation: DataFrame[url, warc_ts, html,

    text, lang] with ``n_docs`` rows. Each task renders only its own id
    range (``spark.range`` → ``mapInPandas``); content is a pure function of
    (seed, id) so the table is identical at any parallelism.
    """
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_rows(pdf["id"].to_numpy(), seed)

    return base.mapInPandas(gen, schema=WEBPAGE_SCHEMA)


def extract_text_udf():
    """Arrow-batched extraction UDF: html binary -> text string.

    Usage: ``df.withColumn("text2", extract_text_udf()(F.col("html")))``.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(lambda b: extract_text(bytes(b)))

    return _extract
