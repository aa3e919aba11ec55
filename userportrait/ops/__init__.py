"""Operator modules, one per SURVEY.md §2 subsection.

Importing this package registers every op into ``userportrait.registry.OPS``.
"""

from . import (  # noqa: F401
    scans,
    relational,
    joins,
    aggregates,
    windows,
    sorts_sets,
    functions,
    portrait,
    ml,
    llm_text,
    llm_dedup,
    llm_similarity,
    multimodal,
    streaming,
    udfs,
    pipeline_ext,
    curation,
    quality,
)

ALL_MODULES = [
    scans,
    relational,
    joins,
    aggregates,
    windows,
    sorts_sets,
    functions,
    portrait,
    ml,
    llm_text,
    llm_dedup,
    llm_similarity,
    multimodal,
    streaming,
    udfs,
    pipeline_ext,
    curation,
    quality,
]
