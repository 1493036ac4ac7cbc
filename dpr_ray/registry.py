"""User-extension surface (SURVEY §2.11): pluggable components keyed by
config, mirroring the reference's hydra ``_target_`` instantiation
(``conf/datasets/*.yaml`` + ``dpr/utils/conf_utils.py:25-44`` and the
``BIENCODER_INITIALIZERS``-style registries, ``dpr/models/__init__.py:62-96``)
without pulling in hydra: a plain name→factory registry per component kind.

Kinds:
- "analyzer":     str -> list[str] tokenizers (default: the DPR-compatible
                  SimpleTokenizer analyzer — the engine's analyzer contract)
- "corpus_source": (path_or_dir, **kw) -> ray.data.Dataset of input_hint rows
- "query_source":  (path, **kw) -> pyarrow.Table (qid, question, answers)
- "scorer":        BM25Params-like factories

``create(kind, {"name": ..., **kwargs})`` instantiates from a config dict —
users register their own with ``@register(kind, name)``.
"""

from __future__ import annotations

from collections.abc import Callable

_REGISTRY: dict[str, dict[str, Callable]] = {}


def register(kind: str, name: str):
    def deco(fn: Callable) -> Callable:
        _REGISTRY.setdefault(kind, {})[name] = fn
        return fn

    return deco


def create(kind: str, config: dict):
    cfg = dict(config)
    name = cfg.pop("name", None)
    if name is None:
        # same friendly shape as the unknown-name error below — a bare
        # KeyError('name') named neither the kind nor the valid options
        known = sorted(_REGISTRY.get(kind, {}))
        raise KeyError(
            f"config for {kind!r} has no 'name' key; known: {known}"
        )
    try:
        factory = _REGISTRY[kind][name]
    except KeyError:
        known = sorted(_REGISTRY.get(kind, {}))
        raise KeyError(f"no {kind!r} named {name!r}; known: {known}") from None
    return factory(**cfg)


def available(kind: str) -> list[str]:
    return sorted(_REGISTRY.get(kind, {}))


# ---- built-ins -------------------------------------------------------------


@register("analyzer", "simple")
def _simple_analyzer():
    from . import analyzer

    return analyzer.tokenize


@register("analyzer", "simple_cased")
def _simple_cased_analyzer():
    from . import analyzer

    return analyzer.tokenize_cased


@register("corpus_source", "parquet")
def _parquet_corpus(path: str, **kw):
    from .util import read_parquet_clean

    return read_parquet_clean(path, **kw)


@register("corpus_source", "documents_table")
def _documents_corpus(sf_dir: str):
    from .corpus import corpus_from_documents

    return corpus_from_documents(sf_dir)


@register("corpus_source", "ctx_tsv")
def _ctx_tsv_corpus(path: str, id_prefix: str = ""):
    import ray.data

    from .sources.qa_sources import read_ctx_tsv

    return ray.data.from_arrow(read_ctx_tsv(path, id_prefix=id_prefix))


@register("query_source", "csv")
def _qa_csv(path: str, **kw):
    from .sources.qa_sources import read_qa_csv

    return read_qa_csv(path, **kw)


@register("query_source", "jsonl")
def _qa_jsonl(path: str, **kw):
    from .sources.qa_sources import read_qa_jsonl

    return read_qa_jsonl(path, **kw)


@register("query_source", "kilt")
def _qa_kilt(path: str):
    from .sources.qa_sources import read_kilt_jsonl

    return read_kilt_jsonl(path)


@register("scorer", "bm25")
def _bm25(k1: float = 0.9, b: float = 0.4):
    from .config import BM25Params

    return BM25Params(k1=k1, b=b)
