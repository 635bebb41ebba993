"""End-to-end corpus curation: the composed training-data pipeline.

Chains the engine's curation operators into the standard order a
large-scale pretraining pipeline runs them (cf. RefinedWeb / Gopher /
FineWeb pipelines — filter before dedup before mix):

1. language filter      (operators/text.language_id)
2. quality filter       (operators/text.quality_score)
2b. DSIR selection      (operators/curation.dsir_scores; optional —
                         importance-score docs against a target domain
                         and keep those above a threshold; docs with no
                         tokens have no score and are dropped)
3. exact dedup          (operators/text.fingerprint — keep lowest id)
4. near-dedup           (operators/dedup.minhash_lsh_candidates +
                         operators/graph.dedup_clusters; optional — the
                         LSH shuffle dominates pipeline cost, so callers
                         can run it on a cadence instead of every batch)
4b. semantic dedup      (operators/similarity.semdedup_prune; optional —
                         needs an embeddings side table keyed by doc id;
                         docs without an embedding pass through)
5. per-source quota     (operators/curation.quota_cap)
6. token-budget packing (operators/curation.pack_token_budget)

Every stage is a DataFrame -> DataFrame transform; nothing materializes
until the caller acts, so Catalyst plans the WHOLE pipeline as one query:
filters push into the scan, narrow stages fuse into single codegen spans,
and only the dedup/quota/packing stages shuffle (one shuffle each, on
different keys — unavoidable, they group by different things).

At 100 TB: stages 1-3 are narrow maps + one hash-agg; stage 4 is the
banded-LSH candidate join (sub-quadratic); stages 5-6 are single-window
shuffles on source / language. The composed plan never collects to the
driver and carries only (id, text, metadata) columns end to end.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_architecture_spark.materialize import truncate_lineage

from lakehouse_architecture_spark.operators.curation import (
    pack_token_budget,
    quota_cap,
)
from lakehouse_architecture_spark.operators.dedup import (
    dedup_keep_first,
    minhash_lsh_candidates,
)
from lakehouse_architecture_spark.operators.graph import connected_components
from lakehouse_architecture_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
)


@dataclass
class CurationConfig:
    languages: tuple[str, ...] = ("en",)
    min_quality: float = 0.0
    source_cap: int | None = None
    token_budget: int | None = None
    near_dedup: bool = False
    minhash_bands: int = 4
    minhash_perms: int = 16
    min_shared_bands: int = 1
    dsir_target_sources: tuple[str, ...] = ()
    min_dsir: float | None = None
    semantic_dedup: bool = False
    semantic_cells: int = 8
    semantic_min_cos: float = 0.9
    stages: list[str] = field(default_factory=list)  # filled by curate_corpus


def curate_corpus(
    docs: DataFrame,
    config: CurationConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    embeddings: DataFrame | None = None,
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run the composed curation pipeline; returns the curated corpus with
    ``n_tokens``, ``quality``, and (when budget-packed) ``running_tokens``
    columns added. ``config.stages`` records which stages were applied.
    """
    config.stages = []
    out = docs

    # 1. language filter — predicted language must be in the allow list
    if config.languages:
        out = language_id(out, text_col).filter(
            F.col("pred_lang").isin(*config.languages)
        )
        config.stages.append("language")

    # 2. quality filter
    out = quality_score(out, text_col).filter(F.col("quality") >= config.min_quality)
    config.stages.append("quality")

    # 2b. DSIR target-domain selection (optional): keep docs whose
    # importance score against the target sources clears the threshold
    if bool(config.dsir_target_sources) != (config.min_dsir is not None):
        raise ValueError(
            "DSIR stage needs BOTH dsir_target_sources and min_dsir "
            "(half-configuration would silently skip the stage)"
        )
    if config.dsir_target_sources and config.min_dsir is not None:
        from lakehouse_architecture_spark.operators.curation import dsir_scores

        keep = (
            dsir_scores(
                out,
                id_col,
                text_col,
                F.col(source_col).isin(*config.dsir_target_sources),
            )
            .filter(F.col("dsir_score") >= config.min_dsir)
            .select(id_col)
        )
        out = out.join(keep, id_col, "left_semi")
        config.stages.append("dsir")

    # 3. exact dedup: keep the lowest id per normalization fingerprint —
    # min-struct aggregation (no window sort), one shuffle on the 60-bit fp
    out = dedup_keep_first(fingerprint(out, text_col), ["fp"], id_col).drop("fp")
    config.stages.append("exact_dedup")

    # 4. near-dedup (optional): MinHash-LSH candidates -> connected
    # components -> drop every non-canonical member.
    if config.near_dedup:
        pairs = minhash_lsh_candidates(
            out,
            id_col,
            text_col,
            num_perm=config.minhash_perms,
            bands=config.minhash_bands,
        ).filter(F.col("n_shared_bands") >= config.min_shared_bands)
        comp = connected_components(pairs, "id_a", "id_b")
        losers = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias(id_col)
        )
        out = out.join(losers, id_col, "left_anti")
        config.stages.append("near_dedup")

    # 4b. semantic dedup (optional): SemDeDup over the embeddings of the
    # surviving docs; pruned ids leave the corpus, docs with no embedding
    # pass through untouched
    if config.semantic_dedup:
        if embeddings is None:
            raise ValueError("semantic_dedup=True requires an embeddings table")
        from lakehouse_architecture_spark.operators.similarity import (
            semdedup_prune_cached,
        )

        emb = embeddings.withColumnRenamed(emb_id_col, id_col).join(
            out.select(id_col), id_col, "left_semi"
        )
        pruned, caches = semdedup_prune_cached(
            emb,
            id_col,
            vec_col,
            n_cells=config.semantic_cells,
            min_cos=config.semantic_min_cos,
        )
        # the one stage that materializes inside curate_corpus: the drop
        # list is checkpointed eagerly so the operator's internal caches
        # can be released here instead of leaking one pair per invocation
        drop = truncate_lineage(
            pruned.filter(F.col("pruned")).select(id_col), eager=True
        )
        for c in caches:
            c.unpersist()
        out = out.join(drop, id_col, "left_anti")
        config.stages.append("semantic_dedup")

    # 5. per-source quota
    if config.source_cap is not None:
        out = quota_cap(out, source_col, id_col, config.source_cap)
        config.stages.append("source_cap")

    # 6. token-budget packing per language (best quality first)
    out = out.withColumn("n_tokens", token_count(F.col(text_col)))
    if config.token_budget is not None:
        out = pack_token_budget(
            out, "pred_lang" if config.languages else source_col,
            "n_tokens", "quality", id_col, config.token_budget,
        )
        config.stages.append("token_budget")
    return out


def curation_report(
    docs: DataFrame,
    curated: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source survival stats: docs in, docs out, tokens kept. One
    aggregation per side + a broadcast-size join on the source key."""
    before = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("docs_in"))
    after = curated.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("docs_out"),
        F.sum("n_tokens").cast("bigint").alias("tokens_out"),
    )
    return (
        before.join(after, source_col, "left")
        .fillna(0, ["docs_out", "tokens_out"])
        .select(source_col, "docs_in", "docs_out", "tokens_out")
    )
