"""Small DPR-parity operators (SURVEY §2) that don't warrant a module:

- ``normalize_passage`` — M1, ``dpr/data/biencoder_data.py:174-180``.
- ``process_question`` — M3, ``dpr/data/retriever_data.py:71-76``
  (normalize + optional special-token suffix).
- ``compress_meta`` / ``decompress_meta`` — the zlib-compressed carried
  passage text of ``save_results_from_meta`` / ``check_answer_from_meta``
  (``dense_retriever.py:383-421``, ``qa_validation.py:144-172``).
- ``join_asr_transcripts`` — S5/J2, ``TTS_ASR_QASrc``
  (``retriever_data.py:228-250``): replace each QA question with its ASR
  transcript matched by id (broadcast small-side hash join).
- ``union_ctx_sources`` — D2, multiple corpora merged; id-prefix (repo
  namespace) keeps external ids disjoint (``dense_retriever.py:461-469``,
  ``retriever_data.py:280-283``).
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from .eval.qa import normalize_question


def normalize_passage(text: str) -> str:
    text = text.replace("\n", " ").replace("’", "'")
    if text.startswith('"'):
        text = text[1:]
    if text.endswith('"'):
        text = text[:-1]
    return text


def process_question(q: str, special_suffix: str = "") -> str:
    q = normalize_question(q)
    if special_suffix:
        q += special_suffix
    return q


def compress_meta(text: str) -> bytes:
    return zlib.compress(text.encode())


def decompress_meta(blob: bytes) -> str:
    return zlib.decompress(blob).decode()


def join_asr_transcripts(qa: pa.Table, asr: pa.Table,
                         id_col: str = "qid",
                         transcript_col: str = "transcript") -> pa.Table:
    """QA rows keep their answers but take the ASR transcript as question;
    rows with no transcript are dropped (reference behavior: only
    successfully matched ids survive, retriever_data.py:239-249)."""
    lookup = dict(
        zip(asr[id_col].to_pylist(), asr[transcript_col].to_pylist())
    )
    keep, questions = [], []
    for i, qid in enumerate(qa[id_col].to_pylist()):
        t = lookup.get(qid)
        if t is not None:
            keep.append(i)
            questions.append(normalize_question(t))
    out = qa.take(pa.array(keep, pa.int64()))
    return out.set_column(
        out.schema.get_field_index("question"), "question",
        pa.array(questions, pa.string()),
    )


def union_ctx_sources(*corpora):
    """Union input_hint-shaped corpora Datasets. Callers must namespace
    ``repo`` per source (the id_prefix analog) so ext_ids stay disjoint."""
    ds = corpora[0]
    for c in corpora[1:]:
        ds = ds.union(c)
    return ds


def multi_set_batches(
    datasets,
    batch_size: int,
    sampling_rates: list[float] | None = None,
    shuffle_seed: int = 0,
    epoch: int = 0,
    shuffle: bool = True,
):
    """K8: the ``MultiSetDataIterator`` analog
    (``dpr/utils/data_utils.py:342-442``) over Ray Datasets — every yielded
    batch comes from ONE source; the interleaving order is a seeded shuffle
    of the per-source batch quota multiset, deterministic per (seed, epoch)
    so a resumed epoch replays the identical schedule (the reference's
    resume contract, ``data_utils.py:411-413``).

    Yields ``(pyarrow.Table, source_idx)``. ``sampling_rates[i]`` scales
    source i's quota like the reference (``int(max_iterations * rate)``);
    a rate > 1 UPSAMPLES by cycling the source's batches, matching
    ``iterate_ds_sampled_data``'s ``itertools.cycle`` over shard indices
    (``data_utils.py:307-312``) — an exhausted source restarts rather
    than silently under-delivering its quota. Only a ZERO-batch source
    skips its slots (nothing to cycle).
    """
    import random

    counts = [ds.count() for ds in datasets]
    max_its = [(n + batch_size - 1) // batch_size for n in counts]
    if sampling_rates:
        quotas = [int(m * r) for m, r in zip(max_its, sampling_rates)]
    else:
        quotas = max_its
    schedule: list[int] = []
    for src, q in enumerate(quotas):
        schedule.extend([src] * q)
    if shuffle:
        random.Random(shuffle_seed + epoch).shuffle(schedule)

    def fresh(i):
        return iter(
            datasets[i].iter_batches(
                batch_size=batch_size, batch_format="pyarrow"
            )
        )

    iters = [fresh(i) for i in range(len(datasets))]
    for src in schedule:
        batch = next(iters[src], None)
        if batch is None and counts[src] > 0:
            iters[src] = fresh(src)  # cycle: the reference upsamples
            batch = next(iters[src], None)
        if batch is not None:
            yield batch, src


def convert_to_kilt(results_ds, id_map_ref, gold_ref=None):
    """S13/J4: flattened result Dataset (qid, question, rank, docid) →
    KILT-provenance Dataset, one row per question:
    ``{id, input, output: [{provenance: [{wikipedia_id, end_paragraph_id},
    ...]}]}`` with provenance in rank order (reference
    ``KiltCsvCtxSrc.convert_to_kilt``, ``dpr/data/retriever_data.py:304-336``).

    ``id_map_ref`` is a ray.put broadcast of {docid: (wikipedia_id,
    end_paragraph_id)} (the reference's pickled mapping file, J4);
    ``gold_ref`` optionally broadcasts {question: kilt_gold_id} so output
    ids follow the gold file as the reference does (falls back to qid)."""
    import json

    import ray

    from ._shipping import ensure_shippable

    ensure_shippable()

    def per_question(group: pa.Table, _memo={}) -> pa.Table:
        # resolve the broadcasts ON the worker, once per process (the
        # mutable-default memo): a driver-side ray.get captured the full
        # id_map in this closure and re-shipped it inside every task's
        # pickled UDF instead of reading it from the object store
        if "maps" not in _memo:
            import ray as _ray

            _memo["maps"] = (
                _ray.get(id_map_ref),
                _ray.get(gold_ref) if gold_ref is not None else {},
            )
        id_map, gold = _memo["maps"]
        rows = sorted(group.to_pylist(), key=lambda r: r["rank"])
        question = rows[0]["question"]
        provenance = [
            {
                "wikipedia_id": id_map[int(r["docid"])][0],
                "end_paragraph_id": id_map[int(r["docid"])][1],
            }
            for r in rows
            if int(r["docid"]) in id_map
        ]
        return pa.table(
            {
                "id": pa.array([str(gold.get(question, rows[0]["qid"]))]),
                "input": pa.array([question]),
                "output": pa.array(
                    [json.dumps([{"provenance": provenance}])]
                ),
            }
        )

    return results_ds.groupby("qid").map_groups(
        per_question, batch_format="pyarrow"
    )
