"""The flagship pipeline: interleaved spans → extracted content spans.

Topology (SURVEY.md §3.4)::

    read (column-pruned)
      → map_batches(SplitMegaDocs)            # stateless, skew defuse
      → map_batches(ExtractSpans, actor pool) # fused assemble+parse+extract
      → groupby(hash(doc_id) % B) bucket reassembly  # the only shuffle
      → write_parquet (wave-partitioned, atomic, resumable)

Two execution shapes:

* ``extract_dataset(ds)`` — composable Dataset → Dataset transform
  (lazy, streaming; no Ray session management).
* ``run_extraction(input, out)`` — checkpoint-resumable job: input
  shards are processed in waves; each wave's output directory is
  written to a temp name and atomically renamed, with a lineage
  manifest (input files, counters, wall time) under ``_lineage/``.
  A rerun skips completed waves (SURVEY.md §4.2 checkpoint/resume).

Shuffle-avoidance note (100 TB thinking): when ``split_threshold`` is
None the pipeline is PURE MAP — each input row stays a complete
document through extraction, so no groupby is needed and nothing is
exchanged. The shuffle path exists only to re-merge split mega-docs,
and it shuffles extracted spans (output-sized), never raw HTML.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

import ray.data

from ..html.extract import ExtractProfile
from ..sources.io import list_input_files, read_interleaved
from ..stages.extractor import ExtractSpans
from ..stages.split import SplitMegaDocs


def extract_dataset(
    ds: "ray.data.Dataset",
    *,
    profile: ExtractProfile | None = None,
    split_threshold: int | None = 256,
    reassembly: str = "map",
    concurrency=None,
    batch_size: int = 96,
    max_doc_bytes: int | None = 256 * 1024 * 1024,
    reassembly_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Compose the extraction stages over an interleaved-docs Dataset.

    ``reassembly`` picks the skew strategy for mega-docs:

    * ``"map"`` (default) — PURE MAP topology, no shuffle: the
      extractor actor parses an over-threshold document one
      span-slice at a time (bounded memory) and emits the complete
      reassembled row itself. Chunks of one doc stay on one actor —
      right unless single documents are so large that one core
      parsing one doc is itself the bottleneck.
    * ``"shuffle"`` — the explicit splitter + ``groupby(doc_id)``
      topology: chunk rows become independent tasks (cross-task
      mega-doc parallelism) and the span sequence is re-merged by the
      groupby shuffle, ordered (chunk_id, offset). The shuffle moves
      extracted spans (output-sized), never raw HTML.
    """
    from ..state.sizing import default_pool_size

    if reassembly not in ("map", "shuffle"):
        raise ValueError(f"reassembly must be 'map' or 'shuffle': {reassembly}")
    shuffle = reassembly == "shuffle" and split_threshold
    if shuffle:
        ds = ds.map_batches(SplitMegaDocs(split_threshold),
                            batch_format="pyarrow")
    if concurrency is None:
        concurrency = default_pool_size()
    ds = ds.map_batches(
        ExtractSpans,
        fn_constructor_kwargs={
            "profile": profile,
            "max_doc_bytes": max_doc_bytes,
            "chunk_spans": None if shuffle else split_threshold},
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        concurrency=concurrency,
    )
    if shuffle:
        # hash-bucketed reassembly: one vectorized task per bucket
        # instead of one map_groups dispatch per doc (at 100k docs the
        # per-group dispatch alone costs seconds); ordering per doc is
        # (chunk_id, in-chunk offset) via the in-task sort, never block
        # order
        import functools
        from ..stages.reassemble import add_reassembly_bucket, \
            reassemble_bucket
        pool = (concurrency if isinstance(concurrency, int)
                else concurrency[1] if isinstance(concurrency, tuple)
                else default_pool_size())
        # per-bucket memory = total extracted spans / num_buckets; the
        # pool-derived default fits single-node corpora — at multi-TB
        # scale pass reassembly_buckets ≈ extracted_bytes / 256 MB so
        # one bucket group stays worker-heap-sized
        num_buckets = (reassembly_buckets if reassembly_buckets
                       else max(16, 2 * pool))
        ds = ds.map_batches(
            functools.partial(add_reassembly_bucket,
                              num_buckets=num_buckets),
            batch_format="pyarrow")
        ds = ds.groupby("rb", num_partitions=num_buckets).map_groups(
            reassemble_bucket, batch_format="pyarrow")
    # map topology: ExtractSpans already emitted the final schema (no
    # chunk columns), so the actor pool is the last operator
    return ds


def _wave_name(i: int) -> str:
    return f"wave-{i:05d}"


def shutil_rmtree(path: str):
    import shutil
    shutil.rmtree(path, ignore_errors=True)


#: A tmp dir younger than this may belong to a LIVE racing run still
#: writing it; deleting it mid-write would crash that run instead of
#: letting it adopt the winner's manifest.  Older tmps are crashed
#: runs' garbage.
_TMP_SWEEP_MIN_AGE_SEC = 3600


def _sweep_stale_tmps(out_dir: str, name: str):
    """Remove orphan tmp dirs for a COMMITTED wave (crashed runs'
    partial writes; the wave's data is already final, so a remaining
    OLD tmp for it is garbage — recent tmps are left alone in case a
    concurrent run is still writing them).  Also matches the
    pre-round-5 un-suffixed `_tmp-{name}` form."""
    candidates = glob.glob(os.path.join(out_dir, f"_tmp-{name}-*"))
    legacy = os.path.join(out_dir, f"_tmp-{name}")
    if os.path.isdir(legacy):
        candidates.append(legacy)
    now = time.time()
    for stale in candidates:
        try:
            age = now - os.path.getmtime(stale)
        except OSError:
            continue
        if age >= _TMP_SWEEP_MIN_AGE_SEC:
            shutil_rmtree(stale)


def run_extraction(
    input_path: str,
    out_dir: str,
    *,
    profile: ExtractProfile | None = None,
    split_threshold: int | None = 256,
    concurrency=None,
    batch_size: int = 96,
    files_per_wave: int = 32,
    resume: bool = True,
    max_doc_bytes: int | None = 256 * 1024 * 1024,
    output_format: str = "parquet",
) -> dict:
    """Checkpoint-resumable extraction job. Returns run summary.

    ``input_path`` may hold interleaved parquet/lance shards OR raw
    WARC archives (``.warc``/``.warc.gz`` — detected when no
    parquet/lance shards exist); archives stream through
    ``sources.warc`` and the resume unit is the archive.

    ``output_format="lance"`` writes each wave as a Lance dataset
    (the north rule's storage target) when the ``lance`` wheel is
    importable — raises ImportError otherwise (this sandbox ships no
    lance); ``"parquet"`` (default) writes identically-shaped parquet.
    Wave commit/resume semantics are format-independent.

    Pool default differs from extract_dataset's: a multi-WAVE job
    creates one actor pool per wave, and back-to-back creation/teardown
    of maximum-size fixed pools stalls the raylet (Ray Data waits for
    every actor of a fixed pool before processing; measured 16s/wave
    stalls at pool=30 vs 3s at pool<=16). Waves therefore default to an
    autoscaling pool with a fast-start minimum: (min(8, n), n).
    """
    if concurrency is None:
        from ..state.sizing import default_pool_size
        n = default_pool_size()
        concurrency = (min(8, n), n)
    # input kind by shard extension: interleaved parquet/lance tables,
    # or raw WARC archives (Common Crawl shape) — WARC waves read the
    # archives and bridge through warc_to_interleaved, so the resume
    # unit is the ARCHIVE either way
    files = list_input_files(input_path)
    warc_input = False
    if not files:
        files = list_input_files(input_path,
                                 exts=(".warc", ".warc.gz"))
        warc_input = bool(files)
    if not files:
        raise FileNotFoundError(f"no input shards under {input_path}")
    kinds = {os.path.splitext(f)[1] for f in files}
    if len(kinds) > 1:
        # a mixed parquet/lance dir (e.g. mid format-conversion) would
        # produce waves whose files feed the wrong reader — fail
        # loudly instead of crashing mid-wave
        raise ValueError(
            f"mixed input shard formats under {input_path}: "
            f"{sorted(kinds)}; run each format separately")
    waves = [files[i:i + files_per_wave]
             for i in range(0, len(files), files_per_wave)]
    lineage_dir = os.path.join(out_dir, "_lineage")
    os.makedirs(lineage_dir, exist_ok=True)

    summary = {"waves_total": len(waves), "waves_run": 0,
               "waves_skipped": 0, "docs": 0, "spans": 0, "errors": 0}
    for i, wave_files in enumerate(waves):
        name = _wave_name(i)
        final_dir = os.path.join(out_dir, name)
        manifest_path = os.path.join(lineage_dir, f"{name}.json")
        if resume and os.path.exists(manifest_path) and os.path.isdir(final_dir):
            with open(manifest_path) as f:
                m = json.load(f)
            committed = m.get("input_files")
            if committed is not None and committed != wave_files:
                # the input set changed under resume: wave boundaries
                # shifted, so skipping by index would silently drop
                # some shards and double-process others.  Fail loudly —
                # resume is only valid over the exact input set that
                # produced the manifests (use a fresh out_dir after
                # adding shards).
                raise ValueError(
                    f"resume mismatch for {name}: manifest was written "
                    f"for {len(committed)} input file(s) that differ "
                    f"from the current wave composition ({len(wave_files)}"
                    f" file(s)). The input set changed since the run "
                    f"being resumed; write to a fresh out_dir.")
            summary["waves_skipped"] += 1
            summary["docs"] += m.get("docs", 0)
            summary["spans"] += m.get("spans", 0)
            summary["errors"] += m.get("errors", 0)
            _sweep_stale_tmps(out_dir, name)
            continue
        if os.path.isdir(final_dir):
            # crash window: died after the directory rename but before
            # the manifest write.  The manifest is the commit marker —
            # a final_dir without one is uncommitted output; remove it
            # so the re-run's os.replace cannot collide (rename onto a
            # non-empty directory raises and would wedge resume).
            shutil_rmtree(final_dir)
        t0 = time.perf_counter()
        if warc_input:
            from ..sources.warc import read_warc, warc_to_interleaved
            ds = read_warc(wave_files).map_batches(
                warc_to_interleaved, batch_format="pyarrow")
            # the archive is the task unit here: the reader's one-row
            # path blocks are fused into the extract actor pool, and a
            # row-count batch_size makes the bundler pack ALL archives
            # of a wave into ONE task (16 one-row blocks < 96 rows ⇒
            # zero parallelism — measured 10x wave slowdown on the
            # 1M-page drill).  batch_size=None = one task per archive,
            # batches = the reader's flush_records yields.
            wave_batch_size = None
        else:
            # split the wave into ≥4 tasks per actor: blocks==files
            # quantizes to ~1 task/actor and the slowest file sets the
            # wave's critical path (same finding as the bench read,
            # measured ~15% there)
            pool_max = (concurrency if isinstance(concurrency, int)
                        else concurrency[1])
            ds = read_interleaved(
                wave_files,
                override_num_blocks=max(4 * pool_max, len(wave_files)))
            wave_batch_size = batch_size
        out = extract_dataset(ds, profile=profile,
                              split_threshold=split_threshold,
                              concurrency=concurrency,
                              batch_size=wave_batch_size,
                              max_doc_bytes=max_doc_bytes)
        # PER-RUN-UNIQUE tmp name: two runs racing on the same out_dir
        # must never share a tmp path — a shared path let one run's
        # stale-cleanup rmtree delete the other's IN-FLIGHT write and
        # produced a committed wave with mixed-run part files (observed
        # live in the round-5 drill).  With unique tmps, committed
        # waves are always single-writer; a racing loser adopts the
        # winner's manifest at os.replace time (below) or errors — it
        # can never corrupt committed data.  Crashed runs' orphan tmps
        # are swept after this wave commits (_sweep_stale_tmps).
        tmp_dir = os.path.join(out_dir,
                               f"_tmp-{name}-{uuid.uuid4().hex[:8]}")
        # ONE fully-streamed pass: extract → write (the executor
        # pipelines read/parse/write; materializing here would serialize
        # the phases and hold the whole wave in the object store —
        # measured 3x slower end-to-end).
        if output_format == "lance":
            import lance  # noqa: F401  (raises if unavailable)
            out.write_lance(tmp_dir)
        else:
            out.write_parquet(tmp_dir)
        if not os.path.isdir(tmp_dir):
            # a ZERO-ROW wave writes nothing and creates no directory
            # (e.g. WARC archives with no 200 text/html records under
            # html_only) — commit an empty wave dir so resume skips it
            # instead of crashing on the accounting read
            os.makedirs(tmp_dir)
            stats = {"count()": 0, "spans": 0, "perr": 0}
            n_err = 0
        else:
            # post-write accounting from the WRITTEN files: a narrow
            # column-pruned read of the counters, no re-extraction
            if output_format == "lance":
                written = ray.data.read_lance(
                    tmp_dir,
                    columns=["status", "n_spans", "n_parse_errors"])
            else:
                written = ray.data.read_parquet(
                    tmp_dir,
                    columns=["status", "n_spans", "n_parse_errors"])
            # counters over ok rows (error rows carry sentinel -1s);
            # count over everything
            stats = written.filter(expr="status == 'ok'").aggregate(
                ray.data.aggregate.Count(),
                ray.data.aggregate.Sum("n_spans", alias_name="spans"),
                ray.data.aggregate.Sum("n_parse_errors",
                                       alias_name="perr"),
            )
            n_err = written.count() - int(stats["count()"] or 0)
        if n_err:
            # rare path: split the written wave into clean + quarantine
            # (format-aware: the clean wave must match output_format;
            # the quarantine sidecar is for inspection and stays
            # parquet either way)
            qdir = os.path.join(out_dir, "_quarantine", name)
            shutil_rmtree(qdir)
            full = (ray.data.read_lance(tmp_dir)
                    if output_format == "lance"
                    else ray.data.read_parquet(tmp_dir))
            full.filter(expr="status != 'ok'").write_parquet(qdir)
            clean_dir = tmp_dir + "-clean"
            shutil_rmtree(clean_dir)
            clean = full.filter(expr="status == 'ok'")
            if output_format == "lance":
                clean.write_lance(clean_dir)
            else:
                clean.write_parquet(clean_dir)
            shutil_rmtree(tmp_dir)
            tmp_dir = clean_dir
        # atomic commit of the wave — tolerant of a CONCURRENT run on
        # the same out_dir (a lingering prior driver, or two retries
        # racing): os.replace onto an existing non-empty directory
        # raises, and before round 5 that crashed the losing run
        # (observed in the 1M-page drill when a presumed-dead driver
        # was still committing).  First commit wins; the loser's
        # output is byte-identical (same inputs, deterministic
        # extraction), so it is discarded and the wave counted from
        # the winner's manifest.
        try:
            os.replace(tmp_dir, final_dir)
        except OSError:
            if os.path.exists(manifest_path):
                # another run committed this wave while we processed
                # it: adopt its manifest, drop our redundant copy
                shutil_rmtree(tmp_dir)
                with open(manifest_path) as f:
                    m = json.load(f)
                summary["waves_skipped"] += 1
                summary["docs"] += m.get("docs", 0)
                summary["spans"] += m.get("spans", 0)
                summary["errors"] += m.get("errors", 0)
                _sweep_stale_tmps(out_dir, name)
                continue
            # final_dir without a manifest: a crashed run's rename
            # window — clear it and retry once (raises if still stuck)
            shutil_rmtree(final_dir)
            os.replace(tmp_dir, final_dir)
        manifest = {
            "wave": name,
            "input_files": wave_files,
            "docs": int(stats["count()"] or 0) + int(n_err),
            "docs_ok": int(stats["count()"] or 0),
            "spans": int(stats["spans"] or 0),
            "parse_errors": int(stats["perr"] or 0),
            "errors": int(n_err),
            "wall_sec": round(time.perf_counter() - t0, 3),
            # Dataset.stats() excerpt (SURVEY.md §4.2 metrics): per-
            # stage wall/cpu/rows for post-hoc performance forensics
            "stats_excerpt": out.stats()[:2000],
        }
        with open(manifest_path + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(manifest_path + ".tmp", manifest_path)
        _sweep_stale_tmps(out_dir, name)
        summary["waves_run"] += 1
        summary["docs"] += manifest["docs"]
        summary["spans"] += manifest["spans"]
        summary["errors"] += manifest["errors"]
    return summary
