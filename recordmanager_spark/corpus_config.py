"""Corpus-pipeline configuration compiler — the reference's
datasources.ini architecture applied to the training-data extension.

The reference drives every per-source behavior from one ini file
(``conf/datasources.ini.sample``; parsed by
``Base/Command/Util/IniFileTrait.php`` — behavioral spec, not code),
and this engine already compiles that surface for record pipelines
(``config.py``). This module gives the LLM curation stages the same
treatment: a ``[corpus:<name>]`` ini section (same PHP-ini dialect —
``key[] =`` appends, quotes, ``;`` comments) compiles into a pipeline
of the engine's verified operators, so a data-curation run is a CONFIG
ARTIFACT, reviewable and diffable, not a bespoke script.

Stage order is FIXED and documented (the SolrUpdater-style contract —
the reference applies field rules -> mappings -> extras in code order,
not ini order):

1. ``languages[]``        — keep listed language codes
2. ``dedup = exact``      — keep the first (min-id) copy per distinct
                            normalized text (``distinct_by_text``)
3. ``min_tokens`` / ``max_tokens`` — whitespace-token quality gate
4. ``cap_group[]`` + ``cap_n``     — per-group frequency cap
                            (``cap_per_group``, census join-back)
5. ``lm_min_avg_logprob`` + ``lm_reference_lang`` — hashed-LM
                            perplexity gate (``lm_score``), trained on
                            the surviving reference-language slice
6. ``sample_rate``        — deterministic hash sample
7. ``split[]``            — train/val/test fractions

Every stage is optional; omitted keys skip the stage. All stages are
the oracle-twinned operators — the compiler only sequences them.

Example::

    [corpus:web_en]
    languages[] = en
    dedup = exact
    min_tokens = 5
    max_tokens = 2000
    cap_group[] = source
    cap_n = 8
    split[] = 0.75
    split[] = 0.125
    split[] = 0.125
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import _bool, _parse_php_ini  # the shared ini dialect

__all__ = ["CorpusConfig", "parse_corpus_ini", "apply_corpus_pipeline"]


@dataclass
class CorpusConfig:
    name: str
    languages: list[str] = field(default_factory=list)
    dedup: str | None = None  # None | "exact"
    min_tokens: int | None = None
    max_tokens: int | None = None
    cap_group: list[str] = field(default_factory=list)
    cap_n: int | None = None
    lm_min_avg_logprob: float | None = None
    lm_reference_lang: str | None = None
    sample_rate: float | None = None
    split: list[float] = field(default_factory=list)
    keep_text: bool = False


def parse_corpus_ini(text: str) -> dict[str, CorpusConfig]:
    """Parse every ``[corpus:<name>]`` section into a CorpusConfig."""
    out: dict[str, CorpusConfig] = {}
    for section, kv in _parse_php_ini(text).items():
        if not section.startswith("corpus:"):
            continue
        name = section.split(":", 1)[1]
        dedup = kv.get("dedup")
        if dedup is not None and dedup != "exact":
            raise ValueError(
                f"[{section}] dedup={dedup!r}: only 'exact' is "
                "config-compilable; near-dup tiers need corpus-specific "
                "banding parameters — call the operators directly"
            )
        cfg = CorpusConfig(
            name=name,
            languages=list(kv.get("languages", [])),
            dedup=dedup,
            min_tokens=int(kv["min_tokens"]) if "min_tokens" in kv else None,
            max_tokens=int(kv["max_tokens"]) if "max_tokens" in kv else None,
            cap_group=list(kv.get("cap_group", [])),
            cap_n=int(kv["cap_n"]) if "cap_n" in kv else None,
            lm_min_avg_logprob=(
                float(kv["lm_min_avg_logprob"])
                if "lm_min_avg_logprob" in kv
                else None
            ),
            lm_reference_lang=kv.get("lm_reference_lang"),
            sample_rate=(
                float(kv["sample_rate"]) if "sample_rate" in kv else None
            ),
            split=[float(x) for x in kv.get("split", [])],
            keep_text=_bool(kv.get("keep_text"), False),
        )
        if cfg.cap_group and cfg.cap_n is None:
            raise ValueError(f"[{section}] cap_group[] set without cap_n")
        if cfg.lm_min_avg_logprob is not None and not cfg.lm_reference_lang:
            raise ValueError(
                f"[{section}] lm_min_avg_logprob needs lm_reference_lang"
            )
        out[name] = cfg
    return out


def apply_corpus_pipeline(
    df: DataFrame,
    cfg: CorpusConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Run the compiled stages in the documented order. Returns the
    surviving rows with ``n_tokens`` (when a token gate ran) and
    ``split`` (when fractions were configured); ``text`` is dropped
    unless ``keep_text`` (a 100 TB output should not carry the corpus
    body through downstream shuffles by default)."""
    from .functions.text import token_count
    from .operators.packing import (
        cap_per_group,
        stratified_sample,
        train_val_test_split,
    )
    from .operators.text_dedup import distinct_by_text

    out = df
    if cfg.languages:
        out = out.where(F.col(lang_col).isin(cfg.languages))
    if cfg.dedup == "exact":
        out = distinct_by_text(out, id_col, text_col)
    if cfg.min_tokens is not None or cfg.max_tokens is not None:
        out = out.withColumn(
            "n_tokens", token_count(text_col).cast("long")
        )
        if cfg.min_tokens is not None:
            out = out.where(F.col("n_tokens") >= cfg.min_tokens)
        if cfg.max_tokens is not None:
            out = out.where(F.col("n_tokens") <= cfg.max_tokens)
    if cfg.cap_group:
        out = cap_per_group(out, cfg.cap_group, cfg.cap_n, id_col=id_col)
    if cfg.lm_min_avg_logprob is not None:
        from .operators.lm_score import lm_logprob, train_hash_lm

        model = train_hash_lm(
            out.where(F.col(lang_col) == cfg.lm_reference_lang), text_col
        )
        scores = lm_logprob(out, model, text_col, id_col).select(
            F.col(id_col), "avg_logprob"
        )
        out = out.join(scores, id_col).where(
            F.col("avg_logprob") >= cfg.lm_min_avg_logprob
        )
    if cfg.sample_rate is not None:
        out = stratified_sample(
            out, rates={}, default_rate=cfg.sample_rate, id_col=id_col
        )
    if cfg.split:
        out = train_val_test_split(
            out,
            fractions=tuple(cfg.split),
            labels=("train", "val", "test")[: len(cfg.split)],
            id_col=id_col,
        )
    if not cfg.keep_text and text_col in out.columns:
        out = out.drop(text_col)
    return out
