"""Manifest-committed parquet tables: snapshot isolation without Delta.

VERDICT r3 "What's missing" #1: the incremental contract (dbt
delete+insert, reference dbt_project.yml:26-52) on plain parquet either
rewrites whole tables behind an atomic dir swap (readers mid-swap race the
rename) or partition-swaps (readers can see a partition mid-replace).
The container has no Delta/Iceberg jars, so this module implements the
minimal transaction-log core those formats are built on:

- Data files are written into the table directory under unique names and
  NEVER mutated or renamed.
- A table STATE is a manifest: a JSON file listing exactly the data files
  (relative paths) that constitute the snapshot.
- A commit is ONE atomic rename: ``_manifests/<uuid>.tmp`` →
  ``_manifests/v{N}.json``. ``os.rename`` is atomic on POSIX, so a reader
  either sees v{N-1} or v{N}, never a mix. Version conflicts (two writers
  racing to the same N) surface as link-target-exists, and the loser
  REBASES: it re-reads the new latest manifest and recomputes its snapshot
  against it (commutative commits — appends, disjoint-partition replaces —
  land on retry; overlapping replaces raise
  :class:`ConcurrentWriteConflict`). This is Delta/Iceberg-style optimistic
  concurrency with commit-time conflict classes; a concurrent writer's
  files are never silently dropped (the round-4 lost-update hazard).
- The committed txn-id set is carried forward on EVERY commit class, so
  ``append_once`` idempotency survives interleaved compaction / erasure /
  merge commits (Delta keeps ``txnAppId`` versions across all commits the
  same way).
- Readers resolve the highest committed version once, then read ONLY the
  files it lists — concurrent commits cannot change a pinned snapshot,
  and crashed writers leave orphan data files that no manifest references
  (harmless; ``vacuum`` removes them).

Scale notes: the manifest holds file paths, not data — at 100 TB it is
KBs-to-MBs of JSON; Delta's checkpointed log is the same idea
industrialized. Reads go through ``spark.read.parquet(*files)``, so column
pruning/pushdown are unchanged; partition-dir layout is preserved for
pruning by keeping hive-style ``col=value/`` relative paths in the file
list and parsing them into partition columns on read.

Log format since r11 (sources/mlog.py): commits write O(changed-files)
DELTA docs with a full snapshot checkpoint every
``mlog.CHECKPOINT_INTERVAL`` versions — a 1-file append to a million-file
table logs KBs, not the whole snapshot. ``_read_manifest`` reconstructs
(nearest checkpoint + deltas, with a per-instance cache), so every caller
above this layer still sees full snapshot dicts; pre-r11 all-full logs are
a degenerate all-checkpoint chain and read unchanged.
"""

from __future__ import annotations

import json
import os
import re
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ecommerce_analytics_platform_spark.sources import mlog
from ecommerce_analytics_platform_spark.sources.evolution import (
    align_to_schema,
    evolve_schema,
)
from ecommerce_analytics_platform_spark.sources.logstore import (
    LogStore,
    PosixLogStore,
)

_VERSION_RE = re.compile(r"^v(\d+)\.json$")


def _tmap(fn, items, workers: int = 16, serial_below: int = 64):
    """Order-preserving map, threaded for I/O-bound per-file work (the
    driver-side Bloom sidecar probes: one ≤16 KB open+read per file —
    GIL-released, so a thread pool turns a 100k-candidate probe from
    100k sequential reads into ~16-way overlapped I/O). Small lists
    stay serial: pool startup costs more than it saves."""
    if len(items) < serial_below:
        return [fn(x) for x in items]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(fn, items))


def _labeled(name: str):
    """Stamp commits made inside the decorated method with ``op: name``
    (Delta's DESCRIBE HISTORY operation column). Outermost label wins —
    a MERGE that internally commits via replace_partitions records
    'merge', not its mechanism — and the flag always resets, including
    on conflict aborts."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrap(self, *a, **k):
            outer = self._pending_op is None
            if outer:
                self._pending_op = name
            try:
                return fn(self, *a, **k)
            finally:
                if outer:
                    self._pending_op = None

        return wrap

    return deco

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _norm_part_value(v) -> str | None:
    """A partition VALUE normalized for path-segment comparison: None
    stays None (matched against the hive default-partition sentinel),
    booleans lowercase (Spark writes ``flag=true``, Python str() says
    ``True`` — r11 review: the mismatch silently pruned every matching
    file), everything else via ``str`` (dates/ints/strings round-trip;
    the same normalization Spark's partition writer uses)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _decode_hive_seg(raw: str) -> str | None:
    """A hive ``col=value`` path VALUE decoded for comparison: the null
    sentinel becomes None; percent-escapes (Spark escapes ``/ : %`` etc.
    with ``%XX`` on write) are unquoted. ADVICE r10: comparing raw
    segments against ``str(value)`` silently pruned away the very files
    holding NULL or escaped partition values."""
    if raw == _HIVE_NULL:
        return None
    return urllib.parse.unquote(raw)


def _hive_dir_values(dirname: str) -> dict[str, str | None]:
    """Decoded ``{col: value}`` of a partition dir path ('' → {})."""
    out: dict[str, str | None] = {}
    for seg in dirname.split(os.sep):
        if "=" in seg and not seg.startswith("_"):
            k, v = seg.split("=", 1)
            out[k] = _decode_hive_seg(v)
    return out


class ConcurrentWriteConflict(RuntimeError):
    """Two writers raced and their commits do NOT commute (overlapping
    partition replaces, a file-surgical rewrite of files another commit
    already rewrote/removed). The table state is still a valid snapshot —
    the losing commit simply never happened; the caller re-reads and
    re-derives."""


class ManifestTable:
    """A parquet table whose state is defined by an atomic manifest."""

    def __init__(
        self, spark: SparkSession, path: str, log_store: LogStore | None = None
    ):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.manifest_dir = os.path.join(self.path, "_manifests")
        # commit-protocol storage seam (VERDICT r12 missing #2): every
        # version-slot publish, doc listing, and doc delete goes through
        # this store — POSIX hardlink mechanics by default, conditional
        # PUT for object-store deployments (sources/logstore.py)
        self.store = log_store or PosixLogStore()
        # stats staged by _write_files for files not yet published
        # (consumed + pruned by _publish); config override for the
        # set_stats_columns commit
        self._staged_stats: dict[str, dict] = {}
        # physical (bytes, rows) per file staged by _write_files,
        # published as the manifest's file_meta key
        self._staged_file_meta: dict[str, list] = {}
        self._pending_stats_columns = self._UNSET
        # Bloom sidecar config override for the set_bloom_columns commit
        self._pending_bloom = self._UNSET
        # clustering config override for the set_cluster_by commit
        self._pending_cluster = self._UNSET
        # CHECK-constraint config override for add/drop_check_constraint
        self._pending_constraints = self._UNSET
        # generated-column config override for set_generated_columns
        self._pending_generated = self._UNSET
        # commit-time change files (write-side CDF): relative parquet
        # paths under _changes/ holding this commit's NET row changes
        # (data columns + _change_type), staged by the writer paths that
        # already hold the ± rows (delete_where, merge). Consumed by the
        # next _publish as the doc's "cdc" key; an apply_fn that detects
        # its precomputed rows went stale resets it to _UNSET so the
        # commit falls back to derivation (sources/cdf_stream.py reads
        # cdc when present, else the bucket-hash diff).
        self._staged_cdc = self._UNSET
        # operation label for commits made by the current public call
        # (set by the @_labeled decorators; recorded as the doc's "op")
        self._pending_op: str | None = None
        # row-preservation flag for the NEXT commit (replace_files
        # data_change=False sets it around its publish; default True)
        self._pending_data_change = True
        # reconstructed-snapshot cache (manifest docs are immutable once
        # published — vacuum's checkpoint rewrite is content-equivalent —
        # so caching by version is safe); bounded FIFO
        self._snap_cache: dict[int, dict] = {}
        # full-snapshot checkpoint cadence; per-instance so tests can
        # force all-full (1) or long chains
        self.checkpoint_interval = mlog.CHECKPOINT_INTERVAL

    # -- log ---------------------------------------------------------------

    def _versions(self) -> list[int]:
        out = []
        for name in self.store.list(self.manifest_dir):
            m = _VERSION_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _read_manifest(self, version: int, columns=None) -> dict:
        """FULL snapshot dict at ``version`` (delta docs reconstructed —
        sources/mlog.py). Sequential walks (``_touched_since``, CDF
        replay) hit the one-delta fast path against the cached
        predecessor instead of re-walking to the checkpoint.

        ``columns`` (VERDICT r12 missing #5) projects the bulk maps
        (``stats`` / ``file_meta`` / ``dv``) — a metadata-plane caller
        that needs only the file list skips decoding per-file stats
        entirely on parquet-checkpoint tables. A cached FULL snapshot is
        returned as-is (superset, zero cost); partial loads never enter
        the cache."""
        snap = self._snap_cache.get(version)
        if snap is not None:
            return snap
        doc = mlog.read_doc(self.path, version)
        if mlog.is_full(doc):
            snap = mlog.resolve_full(doc, self.path, columns=columns)
        else:
            base = self._snap_cache.get(doc.get("delta_base"))
            snap = (
                mlog.apply_delta(base, doc, columns=columns)
                if base is not None
                else mlog.load_snapshot(self.path, version, columns=columns)
            )
        if columns is None:
            if len(self._snap_cache) >= 8:
                self._snap_cache.pop(next(iter(self._snap_cache)))
            self._snap_cache[version] = snap
        return snap

    def _read_doc(self, version: int) -> dict:
        """Raw on-disk doc (full OR delta) — for metadata-only lookups
        (commit ts, data_change stamp) that must not pay reconstruction."""
        return mlog.read_doc(self.path, version)

    def has_txn(self, txn_id: str) -> bool:
        """Whether the CURRENT snapshot already carries ``txn_id`` — the
        cheap pre-check that lets a caller skip recomputing an expensive
        input entirely (the in-loop txn checks still guarantee
        exactly-once if the caller commits anyway)."""
        v = self.latest_version()
        return v is not None and txn_id in self._read_manifest(v).get("txns", [])

    def _publish(self, apply_fn) -> int:
        """Optimistic-concurrency commit loop.

        ``apply_fn(base_version, base_manifest | None) -> (files, txns)``
        or ``(files, txns, schema_json | None)`` recomputes the new
        snapshot AGAINST THE CURRENT BASE on every attempt (return
        ``None`` for an idempotent no-op). Losing the version-slot race
        triggers a REBASE — re-read the new latest, re-apply — never a
        blind retry of a stale snapshot, so a concurrent writer's
        committed files survive (and a schema evolved by a concurrent
        commit re-unions on rebase). ``apply_fn`` raises
        :class:`ConcurrentWriteConflict` when its preconditions no longer
        hold on the new base (non-commuting commits abort cleanly; the
        published chain is always a valid snapshot)."""
        self.store.ensure_dir(self.manifest_dir)
        while True:
            base = self.latest_version()
            m = self._read_manifest(base) if base is not None else None
            res = apply_fn(base, m)
            if res is None:
                return base
            dv = self._UNSET
            if len(res) == 4:
                files, txns, schema_json, dv = res
            elif len(res) == 3:
                files, txns, schema_json = res
            else:
                files, txns = res
                schema_json = None
            if schema_json is None and m is not None:
                # write classes that don't evolve carry the declared
                # schema forward unchanged
                schema_json = m.get("schema")
            if dv is self._UNSET:
                # default deletion-vector semantics: entries carry forward
                # for data files still in the snapshot; a commit that
                # removes/rewrites a file (replace_partitions,
                # replace_files, compaction, merge) implicitly drops its
                # DV — the rewritten file already excludes those rows or
                # redefines them
                fileset = set(files)
                dv = {
                    f: lst
                    for f, lst in (m.get("dv", {}) if m else {}).items()
                    if f in fileset
                }
            # per-file column stats: carry forward for surviving files,
            # merge in whatever this commit collected for its new files
            # (self._staged_stats, set by _write_files); stats_columns
            # config carries forward unchanged
            fileset = set(files)
            stats = {
                f: s
                for f, s in (m.get("stats", {}) if m else {}).items()
                if f in fileset
            }
            stats.update(
                {f: s for f, s in self._staged_stats.items() if f in fileset}
            )
            # physical (bytes, rows) per file: carry forward for
            # surviving files, merge in this commit's staged entries —
            # same lifecycle as stats
            file_meta = {
                f: v
                for f, v in (m.get("file_meta", {}) if m else {}).items()
                if f in fileset
            }
            file_meta.update(
                {f: v for f, v in self._staged_file_meta.items() if f in fileset}
            )
            import time

            doc = {
                "files": sorted(files),
                "base_version": base,
                "txns": sorted(set(txns)),
                # commit wall-clock (epoch seconds) — powers AS OF
                # timestamp reads; absent in pre-r6 manifests (treated
                # as unknown-old by version_at)
                "ts": time.time(),
            }
            if self._pending_op:
                # operation label (DESCRIBE HISTORY); absent in legacy
                # manifests and on raw _publish callers
                doc["op"] = self._pending_op
            if schema_json is not None:
                # the snapshot's declared read schema (additive evolution
                # — see sources/evolution.py); absent in legacy manifests
                doc["schema"] = schema_json
            if self._pending_data_change is False:
                # Delta-style dataChange=false: this commit preserves the
                # logical row multiset (compaction / clustering / DV
                # materialization) — CDF readers skip it at O(metadata)
                doc["data_change"] = False
            if dv:
                # deletion vectors: {data_file: [dv parquet files]} — rows
                # of a data file whose (file, pos) appear in its DV files
                # are logically deleted (applied at read; materialized by
                # materialize_deletes)
                doc["dv"] = {f: sorted(set(lst)) for f, lst in dv.items()}
            if stats:
                # per-file column min/max: manifest-level data skipping
                # (read(stats_predicates=...)) with no parquet footer I/O
                doc["stats"] = stats
            if file_meta:
                # {file: [bytes, rows]} — the physical inventory
                # auto-maintenance plans from without touching the fs
                doc["file_meta"] = file_meta
            sc = (
                self._pending_stats_columns
                if self._pending_stats_columns is not self._UNSET
                else (m.get("stats_columns") if m else None)
            )
            if sc:
                doc["stats_columns"] = sc
            bl = (
                self._pending_bloom
                if self._pending_bloom is not self._UNSET
                else (m.get("bloom") if m else None)
            )
            if bl:
                # Bloom sidecar config ({columns, m_bits, k, seed}) —
                # the bitmaps themselves live NEXT TO the data files
                # (<file>.bloom.<col>), never in the log
                doc["bloom"] = bl
            cl = (
                self._pending_cluster
                if self._pending_cluster is not self._UNSET
                else (m.get("cluster_by") if m else None)
            )
            if cl:
                # persisted clustering config (Delta's clustered-table
                # metadata): writers and auto-maintenance default their
                # layout from it (set_cluster_by)
                doc["cluster_by"] = cl
            cons = (
                self._pending_constraints
                if self._pending_constraints is not self._UNSET
                else (m.get("constraints") if m else None)
            )
            if cons:
                # persisted CHECK constraints (Delta's ADD CONSTRAINT):
                # every data-file write enforces them row-level
                doc["constraints"] = cons
            gen = (
                self._pending_generated
                if self._pending_generated is not self._UNSET
                else (m.get("generated") if m else None)
            )
            if gen:
                # generated-column config (Delta's GENERATED ALWAYS AS):
                # writers materialize absent columns, checks enforce
                # consistency of provided ones
                doc["generated"] = gen
            if self._staged_cdc is not self._UNSET:
                # commit-time change files (Delta's cdc actions): the
                # writer persisted this commit's NET row changes once;
                # CDF readers consume them at O(changes) instead of
                # re-deriving the diff from the rewritten bytes. Read
                # AFTER apply_fn, which may have reset the staging when
                # a concurrent commit invalidated the precomputed rows.
                doc["cdc"] = sorted(self._staged_cdc)
            new_version = (base or 0) + 1
            # log-scale decision (sources/mlog.py): write an
            # O(changed-files) delta doc unless this version is a
            # checkpoint slot, there is no base to delta against, or the
            # delta would not actually be smaller (mass-rewrite commits —
            # overwrite/restore — degenerate to snapshot size anyway)
            out_doc = doc
            if m is not None and new_version % self.checkpoint_interval != 0:
                delta = mlog.make_delta(m, doc)
                # entry-count proxy for "is the delta actually smaller":
                # comparing serialized sizes would json.dumps the FULL doc
                # on every commit — O(table files) CPU per commit, the
                # exact cost class the delta log exists to remove. Entry
                # payloads are the same shape on both sides (file paths,
                # stat dicts), so counts decide the same way bytes would
                # except within noise of the break-even point.
                d_n = sum(
                    len(delta.get(k, ()))
                    for k in (
                        "add_files", "remove_files", "txns_add", "txns_del",
                        "stats_put", "stats_del", "file_meta_put",
                        "file_meta_del", "dv_put", "dv_del",
                    )
                )
                f_n = sum(
                    len(doc.get(k, ()))
                    for k in ("files", "txns", "stats", "file_meta", "dv")
                )
                if d_n < f_n:
                    out_doc = delta
            cp_name = None
            if out_doc is doc:
                # full-doc slot: big snapshots spill their bulk to a
                # parquet checkpoint side file (sources/mlog.py); the
                # slim pointer doc is what contends for the version slot
                out_doc = mlog.encode_full(doc, self.path)
                cp_name = out_doc.get("checkpoint")
            target = os.path.join(self.manifest_dir, f"v{new_version}.json")
            # atomic publish through the LogStore seam; a False return is
            # the lost version-slot race (POSIX: hardlink collision;
            # object store: conditional-PUT precondition failure)
            if self.store.put_if_absent(
                target, json.dumps(out_doc, indent=1).encode()
            ):
                # cache the FULL snapshot under the published version so
                # the next read/commit skips reconstruction entirely
                if len(self._snap_cache) >= 8:
                    self._snap_cache.pop(next(iter(self._snap_cache)))
                self._snap_cache[new_version] = doc
                for f in list(self._staged_stats):
                    if f in fileset:
                        del self._staged_stats[f]
                for f in list(self._staged_file_meta):
                    if f in fileset:
                        del self._staged_file_meta[f]
                return new_version
            # lost the race → rebase on the new latest
            if cp_name is not None:
                # the side file this attempt staged is unreferenced;
                # reclaim it now (vacuum would catch a crashed loser)
                self.store.delete(os.path.join(self.manifest_dir, cp_name))

    def _touched_since(self, since: int | None, until: int | None) -> set[str]:
        """Partition dirs (or '' for root files) whose LOGICAL CONTENT may
        have changed in ``(since, until]`` — the concurrency footprint
        used to decide whether a partition-replace / DV-merge commutes
        with intervening commits:

        - file-list diffs of DATA-CHANGING commits (appends, merges,
          erasures). Row-preserving rewrites (``data_change=false``:
          compaction, DV materialization) are content-neutral by contract
          and excluded — r11 review: counting them made every concurrent
          auto-maintenance pass spuriously abort DV merges.
        - deletion-vector DELTAS of every commit: a DV-only delete
          changes no file list, but a writer whose snapshot predates it
          would resurrect the deleted rows by rewriting those dirs from
          its stale read (r11 review: the lost-delete race on every
          rewrite path).

        A vacuumed (missing) intervening manifest is reported as touching
        everything (conservative abort)."""
        if until is None or since == until:
            return set()
        touched: set[str] = set()
        for v in range((since or 0) + 1, until + 1):
            try:
                d = self._read_doc(v)
            except FileNotFoundError:
                return {"*"}
            flagged = d.get("data_change", True) is False
            if not mlog.is_full(d):
                # O(changes) fast path: a delta doc IS the commit's edit
                # set — no snapshot reconstruction, so the conflict window
                # costs O(changed files) regardless of table size
                add = set(d.get("add_files", []))
                rem = set(d.get("remove_files", []))
                if not flagged:
                    touched |= {os.path.dirname(f) for f in add | rem}
                # DV deltas; for a FLAGGED commit, a DV entry vanishing
                # with its rewritten file is the content-neutral fold-in
                # itself — only deltas on files surviving the commit count
                dv_keys = set(d.get("dv_put", {})) | set(d.get("dv_del", []))
                if flagged:
                    dv_keys -= add | rem
                touched |= {os.path.dirname(f) for f in dv_keys}
                continue
            # checkpoint doc: diff full snapshots (1/checkpoint_interval
            # of commits; the cached predecessor keeps this cheap)
            try:
                m = self._read_manifest(v)
                prev_m = self._read_manifest(v - 1) if v - 1 >= 1 else {}
            except FileNotFoundError:
                return {"*"}
            cur = set(m["files"])
            prev = set(prev_m.get("files", []))
            cur_dv, prev_dv = m.get("dv", {}), prev_m.get("dv", {})
            if not flagged:
                touched |= {os.path.dirname(f) for f in cur ^ prev}
            candidates = (
                (set(cur_dv) | set(prev_dv)) & cur & prev
                if flagged
                else set(cur_dv) | set(prev_dv)
            )
            for f in candidates:
                if sorted(cur_dv.get(f, [])) != sorted(prev_dv.get(f, [])):
                    touched.add(os.path.dirname(f))
        return touched

    def _dv_racing_adds(
        self, since: int | None, until: int | None, touched: list[str]
    ) -> bool:
        """Whether a commit in ``(since, until]`` BOTH changed deletion
        vectors on one of ``touched`` AND added data files — the
        update/merge(dv) commit class, whose appended postimage may hold
        replacement rows for positions a racing delete matched. A pure
        DV-only delete commutes; an update-class commit must conflict
        (see delete_where). Same O(changes) delta-doc walk as
        :meth:`_touched_since`; a vacuumed doc is a conservative True."""
        tset = set(touched)
        for v in range((since or 0) + 1, (until or 0) + 1):
            try:
                d = self._read_doc(v)
            except FileNotFoundError:
                return True
            if not mlog.is_full(d):
                dvk = set(d.get("dv_put", {})) | set(d.get("dv_del", []))
                if (dvk & tset) and d.get("add_files"):
                    return True
                continue
            try:
                m = self._read_manifest(v)
                pm = self._read_manifest(v - 1) if v - 1 >= 1 else {}
            except FileNotFoundError:
                return True
            cur_dv, prev_dv = m.get("dv", {}), pm.get("dv", {})
            changed = any(
                sorted(cur_dv.get(f, [])) != sorted(prev_dv.get(f, []))
                for f in tset
            )
            if changed and set(m["files"]) - set(pm.get("files", [])):
                return True
        return False

    # -- data files --------------------------------------------------------

    def _write_files(self, df: DataFrame, partition_by: list[str] | None) -> list[str]:
        """Write df's data into the table dir under a unique staging prefix
        and return the relative parquet paths. Files land in hive-style
        partition dirs so their paths self-describe partition values."""
        stage = os.path.join(self.path, f"_stage_{uuid.uuid4().hex[:12]}")
        w = self._with_checks(df).write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        try:
            w.parquet(stage)
        except Exception:
            import shutil

            # a failed write (e.g. CHECK violation) must not leak its
            # partially-written staging dir
            shutil.rmtree(stage, ignore_errors=True)
            raise
        out: list[str] = []
        for root, _dirs, files in os.walk(stage):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(root, fn), stage)
                dest = os.path.join(self.path, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                final = os.path.join(
                    os.path.dirname(rel), f"{uuid.uuid4().hex[:12]}_{fn}"
                ) if os.path.exists(dest) else rel
                os.rename(os.path.join(stage, rel), os.path.join(self.path, final))
                out.append(final)
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        # physical file metadata (bytes, rows) staged for the manifest:
        # one stat + one parquet FOOTER read per NEW file — bounded by
        # commit size, never table size — so downstream policy
        # (operators/maintenance.py) plans from the manifest alone
        # instead of a million-file stat sweep at 100 TB
        import pyarrow.parquet as pq

        for rel in out:
            p = os.path.join(self.path, rel)
            self._staged_file_meta[rel] = [
                os.path.getsize(p),
                pq.ParquetFile(p).metadata.num_rows,
            ]
        cols = [
            c for c in (self.stats_columns() or []) if c in df.columns
        ]
        if cols and out:
            self._staged_stats.update(self._collect_stats(out, cols))
        bcfg = self.bloom_config()
        if bcfg and out and any(c in df.columns for c in bcfg["columns"]):
            self._write_bloom_sidecars(out, bcfg)
        return out

    # -- commit-time change files (write-side CDF) ---------------------------

    CDC_COL = "_change_type"

    def _write_cdc(self, changes: DataFrame) -> list[str]:
        """Persist a commit's NET row changes — the table's data columns
        plus ``_change_type`` ∈ {'insert', 'delete'} — as parquet under
        ``_changes/<uuid>/`` and return the table-relative paths.

        This is the write-side half of the CDF contract (VERDICT r12
        next #1, Delta's cdc actions): the writer paths that rewrite or
        tombstone data (``delete_where``, ``merge_delete_insert``)
        already computed the ± rows; persisting them ONCE at commit
        makes every CDF read of that commit O(changes) instead of an
        N-task re-decode of the rewritten bytes. The files are
        referenced from the commit doc's ``"cdc"`` key; ``vacuum``
        reclaims them with their doc. ``changes_between`` deliberately
        does NOT consume them — it derives the diff from the data, and
        is the verification twin that keeps writers honest (the same
        division of labor as the ``data_change=false`` flag)."""
        rel_dir = os.path.join("_changes", uuid.uuid4().hex[:12])
        out_dir = os.path.join(self.path, rel_dir)
        # change sets inherit the upstream shuffle partitioning (an
        # exceptAll leaves spark.sql.shuffle.partitions mostly-empty
        # parts) — coalesce to a handful of files and drop the empty
        # ones, so the CDF read plans a handful of non-empty tasks
        # instead of one per empty shard (probe-measured: 64 empty cdc
        # tasks cost more than the 16-bucket diff they replace)
        changes.coalesce(4).write.parquet(out_dir)
        import pyarrow.parquet as pq

        out = []
        for fn in sorted(os.listdir(out_dir)):
            if not fn.endswith(".parquet"):
                continue
            if pq.ParquetFile(os.path.join(out_dir, fn)).metadata.num_rows:
                out.append(os.path.join(rel_dir, fn))
        return out

    # -- per-file column stats (manifest-level data skipping) ---------------

    def stats_columns(self, version: int | None = None) -> list[str]:
        """Columns this table collects per-file min/max for (set via
        :meth:`set_stats_columns`; empty for tables that never opted in)."""
        v = version if version is not None else self.latest_version()
        if v is None:
            return (
                []
                if self._pending_stats_columns is self._UNSET
                else list(self._pending_stats_columns or [])
            )
        return list(self._read_manifest(v).get("stats_columns", []))

    @_labeled("set_stats_columns")
    def set_stats_columns(self, cols: list[str] | None) -> int:
        """Table-config commit: collect per-file min/max for ``cols`` on
        every subsequent write (Delta's ``dataSkippingStatsColumns``).
        Existing files keep no stats and are conservatively included by
        pruning; rewrite them (compaction / ``write_zordered`` ingest) to
        backfill. ``None``/``[]`` turns collection off (existing stats
        remain usable)."""
        self._pending_stats_columns = list(cols) if cols else None
        try:
            return self._publish(
                lambda _b, m: (list(m["files"]) if m else [], self._base_txns(m))
            )
        finally:
            self._pending_stats_columns = self._UNSET

    # -- persisted clustering config -----------------------------------------

    def cluster_config(self, version: int | None = None) -> list[str] | None:
        """The table's declared clustering columns (:meth:`set_cluster_by`)
        or None for tables that never opted in."""
        v = version if version is not None else self.latest_version()
        if v is None:
            return (
                None
                if self._pending_cluster is self._UNSET
                else self._pending_cluster
            )
        return self._read_manifest(v).get("cluster_by")

    @_labeled("set_cluster_by")
    def set_cluster_by(self, cols: list[str] | None) -> int:
        """Table-config commit: declare the clustering columns (Delta's
        clustered-table metadata / Iceberg's sort order). Writers
        (:meth:`overwrite` / :meth:`append`) whose ``cluster_by``
        argument is omitted cluster by this config automatically, and
        auto-maintenance compaction re-clusters rewrites with it — so
        ``run_maintenance(table)`` alone preserves the layout instead
        of merging range-disjoint small files back into unprunable wide
        ones. Existing files keep their layout until rewritten. Pair
        with :meth:`set_stats_columns` on the same keys so the layout
        actually prunes. ``None``/``[]`` clears the config."""
        self._pending_cluster = list(cols) if cols else None
        try:
            return self._publish(
                lambda _b, m: (list(m["files"]) if m else [], self._base_txns(m))
            )
        finally:
            self._pending_cluster = self._UNSET

    # -- CHECK constraints ----------------------------------------------------

    def check_constraints(self, version: int | None = None) -> dict:
        """The table's persisted CHECK constraints ``{name: sql_expr}``
        (:meth:`add_check_constraint`); {} for tables without any."""
        v = version if version is not None else self.latest_version()
        if v is None:
            return (
                {}
                if self._pending_constraints is self._UNSET
                else dict(self._pending_constraints or {})
            )
        return dict(self._read_manifest(v).get("constraints") or {})

    @_labeled("add_constraint")
    def add_check_constraint(self, name: str, expr: str) -> int:
        """Table-config commit: persist a CHECK constraint (Delta's
        ``ALTER TABLE ADD CONSTRAINT``). Existing rows are validated
        first — ONE pushdown-friendly scan that stops at the first
        violation — and every subsequent data-file write (append /
        overwrite / merge / update postimage / compaction rewrite)
        enforces it ROW-LEVEL inside the write job itself (a violating
        row fails the job before any manifest publish, so the table
        never holds it). SQL CHECK semantics: NULL passes; only FALSE
        violates."""
        chk = F.expr(expr)
        v0 = self.latest_version()
        if v0 is not None and self._read_manifest(v0)["files"]:
            bad = (
                self.read()
                .where(~F.coalesce(chk, F.lit(True)))
                .limit(1)
                .count()
            )
            if bad:
                raise ValueError(
                    f"cannot add CHECK constraint {name!r}: existing rows "
                    f"violate ({expr})"
                )
        cons = dict(self.check_constraints())
        cons[name] = expr
        self._pending_constraints = cons
        try:
            return self._publish(
                lambda _b, m: (list(m["files"]) if m else [], self._base_txns(m))
            )
        finally:
            self._pending_constraints = self._UNSET

    @_labeled("drop_constraint")
    def drop_check_constraint(self, name: str) -> int:
        """Remove a persisted CHECK constraint by name (unknown names
        no-op, matching ``DROP CONSTRAINT IF EXISTS``)."""
        cons = dict(self.check_constraints())
        cons.pop(name, None)
        self._pending_constraints = cons or None
        try:
            return self._publish(
                lambda _b, m: (list(m["files"]) if m else [], self._base_txns(m))
            )
        finally:
            self._pending_constraints = self._UNSET

    def _with_checks(self, df: DataFrame) -> DataFrame:
        """Attach row-level CHECK enforcement to a frame about to be
        written: each constraint becomes a codegen'd predicate INSIDE the
        write job (zero extra passes) that raises — failing the job and
        aborting the commit — on the first FALSE row. NULL passes (SQL
        CHECK semantics). Generated columns enforce the implicit
        invariant ``col <=> (expr)`` the same way (strict: null-safe
        equality never yields NULL)."""
        checks = dict(self.check_constraints())
        for g, e in self.generated_columns().items():
            if g in df.columns:
                checks[f"__generated_{g}"] = f"{g} <=> ({e})"
        for name, sql in checks.items():
            chk = F.expr(sql)
            df = df.where(
                F.when(F.coalesce(chk, F.lit(True)), F.lit(True)).otherwise(
                    F.raise_error(
                        F.lit(f"CHECK constraint {name!r} violated: {sql}")
                    )
                )
            )
        return df

    # -- generated columns ------------------------------------------------------

    def generated_columns(self, version: int | None = None) -> dict:
        """The table's generated-column config ``{col: sql_expr}``
        (:meth:`set_generated_columns`); {} when none declared."""
        v = version if version is not None else self.latest_version()
        if v is None:
            return (
                {}
                if self._pending_generated is self._UNSET
                else dict(self._pending_generated or {})
            )
        return dict(self._read_manifest(v).get("generated") or {})

    @_labeled("set_generated")
    def set_generated_columns(self, mapping: dict | None) -> int:
        """Table-config commit: declare generated columns (Delta's
        ``GENERATED ALWAYS AS``) — ``{col: sql_expr}`` where the expr is
        evaluated over the row's OTHER columns. Writers materialize an
        absent generated column automatically (so producers ship ``ts``
        and the table derives the ``event_date`` it partitions by), and
        a PROVIDED value is enforced consistent (``col <=> expr``)
        inside the write job, exactly like a CHECK constraint.
        :meth:`update_where` recomputes generated columns from the
        post-update row unless the SET clause assigns them explicitly.

        On a non-empty table the column must already exist and agree
        with the expression on every live row (one bounded scan) —
        declare generated columns before first data for the onboarding
        path. ``None``/``{}`` clears the config."""
        v0 = self.latest_version()
        has_rows = v0 is not None and bool(self._read_manifest(v0)["files"])
        if mapping and has_rows:
            sch = self.declared_schema()
            names = {f.name for f in sch.fields} if sch else set()
            for g, e in mapping.items():
                if g not in names:
                    raise ValueError(
                        f"generated column {g!r} does not exist; on a "
                        "non-empty table declare it only for existing "
                        "columns (or create the table with the config)"
                    )
                bad = (
                    self.read()
                    .where(~F.expr(f"{g} <=> ({e})"))
                    .limit(1)
                    .count()
                )
                if bad:
                    raise ValueError(
                        f"cannot declare generated column {g!r}: existing "
                        f"rows disagree with ({e})"
                    )
        self._pending_generated = dict(mapping) if mapping else None
        try:
            return self._publish(
                lambda _b, m: (list(m["files"]) if m else [], self._base_txns(m))
            )
        finally:
            self._pending_generated = self._UNSET

    def _with_generated(self, df: DataFrame) -> DataFrame:
        """Materialize declared generated columns ABSENT from a batch
        (present ones are validated by :meth:`_with_checks` instead).
        Runs before schema evolution so the declared schema includes the
        derived column from the first write."""
        for g, e in self.generated_columns().items():
            if g not in df.columns:
                df = df.withColumn(g, F.expr(e))
        return df

    # -- per-file Bloom sidecars (point-lookup file skipping) ----------------

    def bloom_config(self, version: int | None = None) -> dict | None:
        """The table's Bloom data-skipping config (:meth:`set_bloom_columns`)
        or None for tables that never opted in."""
        v = version if version is not None else self.latest_version()
        if v is None:
            return (
                None
                if self._pending_bloom is self._UNSET
                else self._pending_bloom
            )
        return self._read_manifest(v).get("bloom")

    @_labeled("set_bloom_columns")
    def set_bloom_columns(
        self,
        cols: list[str] | None,
        m_bits: int = 1 << 17,
        k: int = 5,
        seed: int = 101,
    ) -> int:
        """Table-config commit: build a per-file Bloom filter SIDECAR
        (``<datafile>.bloom.<col>``, a packed ``m_bits``-bit bitmap) for
        ``cols`` on every subsequent write — Delta's Bloom filter index.

        This is the point-lookup complement to min/max stats: on a
        high-cardinality key with no write-side clustering, every file's
        [min, max] straddles every needle and stats prune NOTHING, while
        a Bloom answers "definitely not in this file" per file. 100 TB
        shape: sidecars are written once per data file (bounded by
        commit size), live NEXT TO the data (the manifest carries only
        this config — O(1) log growth), and are probed driver-side only
        for files that already survived partition + stats pruning.
        False positives cost one extra file scan; false negatives cannot
        happen for files carrying a sidecar, and files without one
        (written before opt-in) are conservatively kept — rewrite them
        (compaction) to backfill. Defaults: m_bits=2^17 (16 KB/filter),
        k=5 → fpp ≈ 0.5% at ~15k distinct keys/file, ≈ 5% at 40k.

        Hash family: ``seeded_hash60`` (operators/membership.py) —
        executor-side build and driver-side probe are pytest-pinned to
        the same spec. Probes only apply to int/str lookup values (their
        Python ``str()`` equals Spark's ``CAST(x AS STRING)``; other
        types are conservatively unpruned) AND to columns whose DECLARED
        type is string / integral / date (ADVICE r11 #2: a bloom built
        on a double column hashes ``CAST(17.00 AS STRING)`` = '17.0'
        while the probe hashes str(17) = '17' — a silent false negative;
        declaring such a column is rejected here outright).

        Geometry changes are safe: the sidecar FILENAME carries a hash of
        (m_bits, k, seed), so re-configuring with different parameters
        makes every old sidecar invisible to probes (treated as missing
        → conservative keep) instead of silently probed with the wrong
        hash family (ADVICE r11 #1); ``backfill_blooms`` rebuilds and
        ``vacuum`` reclaims the stale ones."""
        if cols:
            declared = self.declared_schema()
            if declared is not None:
                bad = [
                    c
                    for c in cols
                    if c in declared.fieldNames()
                    and not self._bloom_type_ok(declared[c].dataType)
                ]
                if bad:
                    raise ValueError(
                        f"bloom columns must be string/integral/date — "
                        f"{bad} would hash CAST(col AS STRING) at build "
                        f"time but str(value) at probe time, a silent "
                        f"false-negative mismatch"
                    )
        self._pending_bloom = (
            {
                "columns": list(cols),
                "m_bits": int(m_bits),
                "k": int(k),
                "seed": int(seed),
            }
            if cols
            else None
        )
        try:
            return self._publish(
                lambda _b, m: (list(m["files"]) if m else [], self._base_txns(m))
            )
        finally:
            self._pending_bloom = self._UNSET

    @staticmethod
    def _bloom_tag(cfg: dict) -> str:
        """Geometry fingerprint baked into every sidecar FILENAME: two
        sidecars are interchangeable iff (m_bits, k, seed) match, so a
        config change makes old bitmaps unfindable (conservative keep)
        instead of silently probed with the wrong hash family — size
        alone cannot tell a same-m_bits re-seed apart (ADVICE r11 #1)."""
        import hashlib

        key = f"{int(cfg['m_bits'])}:{int(cfg['k'])}:{int(cfg['seed'])}"
        return hashlib.sha1(key.encode()).hexdigest()[:8]

    @staticmethod
    def _bloom_type_ok(dt) -> bool:
        """Declared column types whose Spark ``CAST(col AS STRING)``
        equals Python ``str(probe_value)`` for int/str/date probes —
        the build/probe hash-input contract (ADVICE r11 #2). Floats,
        decimals and timestamps render differently ('17.0' vs '17',
        fractional-second formatting) and are excluded."""
        from pyspark.sql.types import (
            ByteType,
            DateType,
            IntegerType,
            LongType,
            ShortType,
            StringType,
        )

        return isinstance(
            dt, (StringType, ByteType, ShortType, IntegerType, LongType, DateType)
        )

    def _bloom_probe_ok(self, col: str, version: int | None) -> bool:
        """Whether pruning on ``col`` keeps no-false-negatives: the
        DECLARED schema must say the column is string/integral/date.
        Unknown schema (legacy tables) → False: the on-disk type could
        be anything, and a double column would hash '17.0' at build
        time vs '17' at probe time — prune nothing rather than lose
        rows."""
        declared = self.declared_schema(version)
        if declared is None or col not in declared.fieldNames():
            return False
        return self._bloom_type_ok(declared[col].dataType)

    def _bloom_sidecar(self, rel_file: str, col: str, cfg: dict | None = None) -> str:
        if cfg is None:
            cfg = self.bloom_config()
        return os.path.join(
            self.path, f"{rel_file}.bloom.{col}.{self._bloom_tag(cfg)}"
        )

    def _bloom_pack_plan(
        self, rel_files: list[str], cfg: dict, use_declared_schema: bool = False
    ):
        """The names-only publication plan for one bounded Spark pass
        over ``rel_files``: each (file, column) group packs its bitmap
        AND WRITES ITS OWN SIDECAR executor-side (atomic tmp+rename is
        task-safe — write-once names keyed by the data file); the driver
        collects only (file, column) name pairs, never bitmap bytes
        (VERDICT r11 missing #2: driver-side publication of a million
        backfilled bitmaps moved GBs through one process). Returns None
        when no configured column is readable from these files."""
        from ecommerce_analytics_platform_spark.operators.membership import (
            bloom_position_cols,
        )

        m_bits, k, seed = int(cfg["m_bits"]), int(cfg["k"]), int(cfg["seed"])
        reader = self.spark.read.option("basePath", self.path)
        if use_declared_schema:
            # backfill path: OLD files may predate an added column —
            # the declared schema back-fills NULL instead of failing.
            # The fresh-write path must NOT do this: a widening commit's
            # just-written files are wider than the still-unevolved
            # declared schema, and forcing the narrow read would fail.
            declared = self.declared_schema()
            if declared is not None:
                reader = reader.schema(declared)
        df = reader.parquet(*[os.path.join(self.path, f) for f in rel_files])
        cols = [c for c in cfg.get("columns", []) if c in df.columns]
        if not cols:
            return None
        pos = None
        for c in cols:
            part = df.select(
                self._rel_file_col().alias("__f"),
                F.lit(c).alias("__c"),
                F.explode(
                    F.array(*bloom_position_cols(c, m_bits, k, seed))
                ).alias("__p"),
            ).filter(F.col("__p").isNotNull())  # NULL values set no bits
            pos = part if pos is None else pos.unionByName(part)
        nbytes = m_bits // 8
        base_path = self.path
        tag = self._bloom_tag(cfg)

        def _pack(pdf):
            import os as _os
            import uuid as _uuid

            import numpy as np
            import pandas as pd

            buf = np.zeros(nbytes, dtype=np.uint8)
            arr = pdf["__p"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(buf, arr // 8, (1 << (arr % 8)).astype(np.uint8))
            f, c = pdf["__f"].iloc[0], pdf["__c"].iloc[0]
            path = _os.path.join(base_path, f"{f}.bloom.{c}.{tag}")
            # atomic publish from the packing task itself: a torn
            # sidecar that still reached full length would DROP bits →
            # false negatives, so tmp+rename makes it all-or-nothing
            tmp = f"{path}.{_uuid.uuid4().hex[:8]}.tmp"
            with open(tmp, "wb") as fh:
                fh.write(buf.tobytes())
            _os.rename(tmp, path)
            return pd.DataFrame({"f": [f], "c": [c]})

        return (
            pos.groupBy("__f", "__c").applyInPandas(_pack, "f string, c string"),
            cols,
        )

    def _write_bloom_sidecars(
        self, rel_files: list[str], cfg: dict, use_declared_schema: bool = False
    ) -> None:
        """One bounded Spark pass over the given files → one packed
        bitmap sidecar per (file, column), written EXECUTOR-SIDE
        (:meth:`_bloom_pack_plan`).

        A (file, column) with no non-NULL values — the column is all-NULL
        in that file, or absent from it entirely (written before an
        additive evolution) — gets an ALL-ZERO sidecar: exact, not
        conservative, because a NULL can never equal a probe's non-NULL
        value, so "contains nothing" is the truth. This also makes
        :meth:`backfill_blooms` converge (every file ends up carrying a
        sidecar for every configured column it could ever match on)."""
        plan = self._bloom_pack_plan(rel_files, cfg, use_declared_schema)
        if plan is None:
            return
        packed, cols = plan
        # driver receives NAMES only; the bitmaps were published by the
        # packing tasks themselves
        written = {(r["f"], r["c"]) for r in packed.collect()}
        zero = bytes(int(cfg["m_bits"]) // 8)
        for f in rel_files:
            for c in cols:
                if (f, c) not in written:
                    path = self._bloom_sidecar(f, c, cfg)
                    tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
                    with open(tmp, "wb") as fh:
                        fh.write(zero)
                    os.rename(tmp, path)

    # files per Spark pass of a bloom backfill: bounds the pass's file
    # list (driver memory, scheduler state) so a million-file opt-in
    # streams through bounded chunks instead of one giant relation
    _BLOOM_BACKFILL_CHUNK = 4096

    def backfill_blooms(self, version: int | None = None) -> list[str]:
        """Build Bloom sidecars for snapshot files that lack them (or
        carry a stale geometry after a config change) WITHOUT rewriting
        any data — how an existing 100 TB table opts in: bounded chunked
        scans of the un-indexed files, zero commits (sidecars live
        outside the log; probes treat missing ones as unprunable, so
        this is purely additive). Idempotent — returns the files it
        indexed, empty when the table is fully covered."""
        cfg = self.bloom_config(version)
        if not cfg:
            return []
        v = version if version is not None else self.latest_version()
        if v is None:
            return []
        m = self._read_manifest(v)
        declared = self.declared_schema(v)
        want = [
            c
            for c in cfg.get("columns", [])
            if declared is None or c in declared.fieldNames()
        ]
        if not want:
            return []
        nbytes = int(cfg["m_bits"]) // 8

        def unindexed(f: str) -> bool:
            for c in want:
                try:
                    if os.path.getsize(self._bloom_sidecar(f, c, cfg)) == nbytes:
                        continue
                except FileNotFoundError:
                    pass
                return True
            return False

        # threaded stat sweep: coverage checking a million-file table is
        # one metadata pass; overlapping the stats matters on object
        # stores where each is an RPC
        verdicts = _tmap(unindexed, m["files"])
        missing = [f for f, bad in zip(m["files"], verdicts) if bad]
        for i in range(0, len(missing), self._BLOOM_BACKFILL_CHUNK):
            self._write_bloom_sidecars(
                missing[i : i + self._BLOOM_BACKFILL_CHUNK],
                cfg,
                use_declared_schema=True,
            )
        return missing

    @_labeled("stamp_file_meta")
    def backfill_file_meta(self) -> list[str]:
        """Stamp ``file_meta`` ({file: [bytes, rows]}) for snapshot files
        that predate the r11 commit-time inventory — ONE metadata-only
        commit (no data file changes, so CDF plans zero tasks for it and
        it commutes with everything), after which
        ``operators/maintenance.maintenance_plan`` runs at O(manifest)
        with ZERO filesystem calls on this table too (VERDICT r11
        missing #3: legacy tables paid an os.stat + footer read PER FILE
        per planning pass). The size/footer scan itself runs
        EXECUTOR-SIDE (mapInPandas over the file list), one pass, ever.
        Idempotent: returns the files stamped, empty when covered."""
        v = self.latest_version()
        if v is None:
            return []
        m = self._read_manifest(v)
        meta = m.get("file_meta", {})
        missing = [f for f in m["files"] if f not in meta]
        if not missing:
            return []
        base_path = self.path

        def _scan(batches):
            import os as _os

            import pandas as pd
            import pyarrow.parquet as pq

            for pdf in batches:
                rows = []
                for rel in pdf["f"]:
                    p = _os.path.join(base_path, rel)
                    rows.append(
                        (rel, _os.path.getsize(p), pq.ParquetFile(p).metadata.num_rows)
                    )
                yield pd.DataFrame(rows, columns=["f", "b", "r"])

        n_part = max(1, min(len(missing) // 256 + 1, 64))
        scanned = (
            self.spark.createDataFrame([(f,) for f in missing], "f string")
            .repartition(n_part)
            .mapInPandas(_scan, "f string, b long, r long")
            .collect()  # names + two ints per file — manifest-sized
        )
        self._staged_file_meta.update({r["f"]: [r["b"], r["r"]] for r in scanned})
        self._publish(
            lambda _b, mm: (list(mm["files"]) if mm else [], self._base_txns(mm))
        )
        return missing

    def detail(self, version: int | None = None) -> dict:
        """DESCRIBE DETAIL: one metadata-only summary dict of the table
        at ``version`` (default latest) — location, file/byte/row
        counts (from the manifest's file_meta inventory; None when a
        legacy file predates it), partition/cluster/stats/bloom/
        constraint/generated config, DV and CDC presence, txn count.
        Zero filesystem calls beyond the manifest read."""
        v = version if version is not None else self.latest_version()
        if v is None:
            raise FileNotFoundError(f"no committed manifest under {self.path}")
        m = self._read_manifest(v)
        meta = m.get("file_meta", {})
        covered = [f for f in m["files"] if f in meta]
        full = len(covered) == len(m["files"])
        return {
            "location": self.path,
            "version": v,
            "ts": m.get("ts"),
            "num_files": len(m["files"]),
            "size_bytes": sum(meta[f][0] for f in covered) if full else None,
            "num_rows": sum(meta[f][1] for f in covered) if full else None,
            "partition_columns": self.partition_columns(v),
            "cluster_by": m.get("cluster_by") or [],
            "stats_columns": m.get("stats_columns") or [],
            "bloom_columns": (m.get("bloom") or {}).get("columns", []),
            "constraints": dict(m.get("constraints") or {}),
            "generated_columns": dict(m.get("generated") or {}),
            "num_deletion_vector_files": sum(
                len(lst) for lst in m.get("dv", {}).values()
            ),
            "has_change_files": bool(m.get("cdc")),
            "num_txns": len(m.get("txns", [])),
        }

    @_labeled("stamp_stats")
    def backfill_stats(self, chunk: int = 4096) -> list[str]:
        """Collect per-file min/max column stats for snapshot files that
        predate the ``set_stats_columns`` config (or an expanded one) —
        file skipping on an EXISTING table without rewriting a byte (the
        ALTER-then-ANALYZE onboarding shape; completes the backfill
        family next to :meth:`backfill_blooms` / :meth:`backfill_file_meta`).
        One DISTRIBUTED column-pruned scan per ``chunk`` files (cost ∝
        stats columns' bytes, not table width), ONE metadata-only commit.
        Idempotent: files already carrying stats for every configured
        column are skipped; returns the files stamped. A configured
        column absent from a legacy file's footer stats as [None, None]
        — the conservative-keep value pruning already honors."""
        v = self.latest_version()
        if v is None:
            return []
        cols = self.stats_columns(v)
        if not cols:
            return []
        m = self._read_manifest(v)
        stats = m.get("stats", {})
        missing = [
            f
            for f in m["files"]
            if any(c not in stats.get(f, {}) for c in cols)
        ]
        if not missing:
            return []
        for i in range(0, len(missing), chunk):
            part = missing[i : i + chunk]
            got = self._collect_stats(part, cols)
            # explicit [None, None] for columns a legacy file lacks (or
            # zero-row files the agg never saw): conservative-keep at
            # prune time AND a coverage marker, so detection converges
            # instead of re-flagging the same files every pass
            for f in part:
                st = got.setdefault(f, {})
                existing = stats.get(f, {})
                for c in cols:
                    st.setdefault(c, existing.get(c, [None, None]))
            self._staged_stats.update(got)
        self._publish(
            lambda _b, mm: (list(mm["files"]) if mm else [], self._base_txns(mm))
        )
        return missing

    # DV merges collect the batch's distinct keys driver-side to probe
    # Bloom sidecars only when the batch is point-update-sized; bigger
    # batches skip pruning (they'd touch most files anyway)
    _BLOOM_MERGE_KEY_CAP = 10_000

    def _bloom_candidate_files(
        self,
        files: list[str],
        key_rows: list,
        unique_key: list[str],
        cfg: dict,
        version: int | None = None,
    ) -> list[str] | None:
        """Files that MAY contain ANY of the batch's unique keys, by
        probing each file's per-column Bloom sidecars (vectorized over
        keys with numpy — one ≤16 KB sidecar read + one gather per
        (file, column)). Returns None ("don't prune") when the guarantee
        can't be kept: a column not bloom-indexed, a NULL or non-int/str
        key value (its ``str()`` may not equal Spark's CAST AS STRING),
        a column whose DECLARED type isn't string/integral/date (same
        mismatch from the build side — ADVICE r11 #2), or no keys. A
        composite key prunes per column independently — a file holding
        the full key holds every column's value, so the per-column AND
        keeps no-false-negatives."""
        import numpy as np

        from ecommerce_analytics_platform_spark.operators.membership import (
            _py_positions,
        )

        if not key_rows or not all(c in cfg.get("columns", []) for c in unique_key):
            return None
        if not all(self._bloom_probe_ok(c, version) for c in unique_key):
            return None
        m_bits, k, seed = int(cfg["m_bits"]), int(cfg["k"]), int(cfg["seed"])
        nbytes = m_bits // 8
        pos_by_col: dict[str, np.ndarray] = {}
        for c in unique_key:
            vals = [r[c] for r in key_rows]
            if not all(
                isinstance(v, (int, str)) and not isinstance(v, bool)
                for v in vals
            ):
                return None
            pos_by_col[c] = np.array(
                [_py_positions(v, m_bits, k, seed) for v in vals],
                dtype=np.int64,
            )  # (n_keys, k)
        def probe_one(f: str) -> bool:
            # per key: AND over columns of (all k bits set); file is a
            # candidate if ANY key survives
            alive = None
            for c in unique_key:
                try:
                    with open(self._bloom_sidecar(f, c, cfg), "rb") as fh:
                        buf = np.frombuffer(fh.read(), dtype=np.uint8)
                except FileNotFoundError:
                    return True  # pre-opt-in file: conservative
                if buf.size != nbytes:
                    return True
                pos = pos_by_col[c]
                bits = (buf[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
                col_ok = bits.all(axis=1)
                alive = col_ok if alive is None else (alive & col_ok)
                if not alive.any():
                    return False
            return alive is not None and bool(alive.any())

        verdicts = _tmap(probe_one, files)
        return [f for f, ok in zip(files, verdicts) if ok]

    def _prune_by_bloom(
        self,
        files: list[str],
        predicates: list[tuple],
        cfg: dict,
        version: int | None = None,
    ) -> list[str]:
        """Drop files whose Bloom sidecar proves the lookup value(s)
        absent. Only ``=`` and ``in`` predicates on configured columns
        with int/str values AND a declared string/integral/date column
        type participate; every other case — missing, wrong-size or
        wrong-geometry sidecar, other ops, other value/column types —
        keeps the file. Driver cost: one ≤16 KB sidecar read per
        surviving file per predicate, same O(candidate files) class as
        stats pruning."""
        from ecommerce_analytics_platform_spark.operators.membership import (
            _py_positions,
        )

        m_bits, k, seed = int(cfg["m_bits"]), int(cfg["k"]), int(cfg["seed"])
        nbytes = m_bits // 8
        cols = set(cfg.get("columns", []))
        out = files
        for p in predicates:
            col, op, *vals = p
            if col not in cols or not self._bloom_probe_ok(col, version):
                continue
            if op == "=":
                values = [vals[0]]
            elif op == "in":
                values = list(vals[0])
            else:
                continue
            if not values or not all(
                isinstance(v, (int, str)) and not isinstance(v, bool)
                for v in values
            ):
                continue  # str(v) must equal Spark's CAST AS STRING
            pos_sets = [
                sorted(set(_py_positions(v, m_bits, k, seed))) for v in values
            ]

            def probe_one(f: str) -> bool:
                try:
                    with open(self._bloom_sidecar(f, col, cfg), "rb") as fh:
                        buf = fh.read()
                except FileNotFoundError:
                    return True  # pre-opt-in file: conservative keep
                if len(buf) != nbytes:
                    return True  # stale geometry: keep
                return any(
                    all(buf[q >> 3] & (1 << (q & 7)) for q in ps)
                    for ps in pos_sets
                )

            verdicts = _tmap(probe_one, out)
            out = [f for f, ok in zip(out, verdicts) if ok]
        return out

    @staticmethod
    def _stat_value(v):
        """JSON-safe, order-preserving canonical form: numbers stay
        numbers; dates/timestamps become ISO strings (lexicographic order
        == chronological order); everything else stringifies."""
        import datetime as _dt

        if v is None or isinstance(v, (int, float, str, bool)):
            return v
        if isinstance(v, _dt.datetime):
            return v.isoformat(sep=" ")
        if isinstance(v, _dt.date):
            return v.isoformat()
        return str(v)

    def _collect_stats(self, rel_files: list[str], cols: list[str]) -> dict:
        """One Spark scan of the NEWLY WRITTEN files (bounded by commit
        size, never table size) → ``{file: {col: [min, max]}}``."""
        df = self.spark.read.option("basePath", self.path).parquet(
            *[os.path.join(self.path, f) for f in rel_files]
        )
        present = [c for c in cols if c in df.columns]
        if not present:
            return {}
        agg = df.groupBy(self._rel_file_col().alias("__f")).agg(
            *[F.min(c).alias(f"__mn_{c}") for c in present],
            *[F.max(c).alias(f"__mx_{c}") for c in present],
        )
        out: dict[str, dict] = {}
        for r in agg.collect():
            out[r["__f"]] = {
                c: [
                    self._stat_value(r[f"__mn_{c}"]),
                    self._stat_value(r[f"__mx_{c}"]),
                ]
                for c in present
            }
        return out

    @classmethod
    def _prune_by_stats(
        cls, files: list[str], stats: dict, predicates: list[tuple]
    ) -> list[str]:
        """Keep files whose [min, max] ranges CAN satisfy every predicate.
        Files without stats for a predicate's column are kept
        conservatively (legacy commits, all-NULL ranges). Pure function —
        a false positive costs a scan, a false negative would lose rows,
        so every branch defaults to keep."""
        out = []
        for f in files:
            fstats = stats.get(f, {})
            keep = True
            for p in predicates:
                col, op, *vals = p
                rng = fstats.get(col)
                if not rng or rng[0] is None or rng[1] is None:
                    continue  # no usable stats -> conservative keep
                mn, mx = rng
                v = cls._stat_value(vals[0])
                try:
                    keep = cls._range_can_satisfy(mn, mx, op, v, vals)
                except TypeError:
                    keep = True  # incomparable types -> conservative keep
                if not keep:
                    break
            if keep:
                out.append(f)
        return out

    @classmethod
    def _range_can_satisfy(cls, mn, mx, op, v, vals) -> bool:
        if op == "=":
            return mn <= v <= mx
        if op == ">=":
            return mx >= v
        if op == ">":
            return mx > v
        if op == "<=":
            return mn <= v
        if op == "<":
            return mn < v
        if op == "between":
            hi = cls._stat_value(vals[1])
            return mx >= v and mn <= hi
        if op == "in":
            # ("col", "in", [v1, v2, ...]) — satisfiable if ANY value
            # falls inside the file's range
            return any(mn <= cls._stat_value(x) <= mx for x in vals[0])
        raise ValueError(f"unknown stats predicate op {op!r}")

    # -- public API --------------------------------------------------------

    @staticmethod
    def _base_txns(m: dict | None) -> list[str]:
        return list(m.get("txns", [])) if m else []

    # -- declared schema (additive evolution; sources/evolution.py) --------

    def declared_schema(self, version: int | None = None) -> StructType | None:
        """The snapshot's declared read schema (None for legacy manifests
        predating schema tracking and for empty tables)."""
        v = version if version is not None else self.latest_version()
        if v is None:
            return None
        sj = self._read_manifest(v).get("schema")
        return StructType.fromJson(sj) if sj else None

    def _evolved(
        self, df: DataFrame, on_schema_change: str = "append_new_columns"
    ) -> tuple[DataFrame, StructType]:
        """Align ``df`` to the union of (current declared schema, its own
        schema). Legacy tables bootstrap the declared schema from a file
        read once; the union lands in the next manifest."""
        existing = self.declared_schema()
        if existing is None and self.latest_version() is not None:
            try:
                existing = self.read().schema
            except ValueError:
                # config-only history (set_stats_columns /
                # set_bloom_columns on a fresh table commits a version
                # with ZERO files and no declared schema): there is no
                # existing schema to union with — the first data write
                # defines it
                existing = None
        union = evolve_schema(existing, df.schema, on_schema_change)
        return align_to_schema(df, union), union

    @staticmethod
    def _rebased_schema_json(m: dict | None, union: StructType) -> dict:
        """Re-union against the base a rebased publish attempt actually
        sees: a concurrent commit may have widened the schema after this
        writer computed ``union``. Files already written under ``union``
        stay valid — the read back-fills what they lack."""
        base = StructType.fromJson(m["schema"]) if m and m.get("schema") else None
        return evolve_schema(base, union).jsonValue()

    @staticmethod
    def _clustered(
        df: DataFrame,
        partition_by: list[str] | None,
        cluster_by: list[str],
        num_files: int,
    ) -> DataFrame:
        """Cluster before writing (sources/layout.py rationale): every
        data file should cover a NARROW range of the cluster key(s) —
        the write-side move that makes manifest min/max stats (and
        parquet row-group stats) actually prune. The session pins
        parquet TIMESTAMP_MICROS (session.py), so timestamp cluster
        keys keep footer stats.

        ONE key (or non-quantizable types, e.g. strings): lexicographic
        range clustering — each output task holds one contiguous key
        range, rows sorted inside it.

        TWO OR MORE quantizable keys (VERDICT r11 next #8): a
        lexicographic sort leaves every non-leading key's per-file range
        WIDE (the second key cycles within each leading-key run), so
        only the first column prunes. Morton-interleave instead
        (layout.with_zorder_key): files cover compact
        hyper-rectangle-ish regions, and min/max stats prune on EVERY
        clustered column — Delta's OPTIMIZE ... ZORDER under the same
        ``cluster_by`` API."""
        from ecommerce_analytics_platform_spark.sources.layout import (
            with_zorder_key,
            zorderable_columns,
        )

        pk = list(partition_by or [])
        if len(cluster_by) >= 2 and zorderable_columns(df, list(cluster_by)):
            bits = min(12, max(4, 62 // len(cluster_by)))
            out = with_zorder_key(df, list(cluster_by), bits=bits)
            return (
                out.repartitionByRange(num_files, *pk, "__z")
                .sortWithinPartitions(*pk, "__z")
                .drop("__z")
            )
        keys = pk + list(cluster_by)
        return df.repartitionByRange(num_files, *keys).sortWithinPartitions(*keys)

    @_labeled("overwrite")
    def overwrite(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        cluster_by: list[str] | None = None,
        num_files: int = 8,
    ) -> int:
        """Full snapshot replace: new files + manifest listing only them.
        Last-writer-wins BY DEFINITION (an overwrite means "the table is
        now exactly this"); the txn-id set still carries forward so
        ``append_once`` idempotency survives. Old files stay on disk for
        readers pinned to old versions (time travel) until ``vacuum``.

        ``cluster_by`` range-clusters the write so per-file stats become
        prunable ranges (``num_files`` output tasks; see
        :meth:`_clustered`) — pair with :meth:`set_stats_columns` on the
        cluster key. Omitted (None), it defaults to the table's
        persisted :meth:`set_cluster_by` config; pass ``[]`` to opt a
        single write out explicitly."""
        df = self._with_generated(df)
        if cluster_by is None:
            cluster_by = self.cluster_config()
        if cluster_by:
            df = self._clustered(df, partition_by, cluster_by, num_files)
        files = self._write_files(df, partition_by)
        # an overwrite REDEFINES the table: the declared schema resets to
        # exactly this df's (nullable) schema, never a union with the past
        schema_json = evolve_schema(None, df.schema).jsonValue()
        return self._publish(lambda _base, m: (files, self._base_txns(m), schema_json))

    @_labeled("append")
    def append(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        on_schema_change: str = "append_new_columns",
        cluster_by: list[str] | None = None,
        num_files: int = 8,
    ) -> int:
        """Blind append — commutes with every other commit class: a lost
        version race rebases onto the winner's file list (and re-unions
        the declared schema). New columns land additively per the
        reference's ``on_schema_change: append_new_columns`` contract
        (dbt_project.yml:29); type changes raise. ``cluster_by``
        range-clusters THIS batch's files (cross-batch overlap is what
        compaction re-clusters later); omitted, it defaults to the
        table's persisted :meth:`set_cluster_by` config (``[]`` opts
        out)."""
        self._check_partition_layout(partition_by)
        df = self._with_generated(df)
        df, union = self._evolved(df, on_schema_change)
        if cluster_by is None:
            cluster_by = self.cluster_config()
        if cluster_by:
            df = self._clustered(df, partition_by, cluster_by, num_files)
        files = self._write_files(df, partition_by)
        return self._publish(
            lambda _base, m: (
                (m["files"] if m else []) + files,
                self._base_txns(m),
                self._rebased_schema_json(m, union),
            )
        )

    _UNSET = object()

    @_labeled("replace_partitions")
    def replace_partitions(
        self,
        df: DataFrame,
        partition_by: list[str],
        txn_id: str | None = None,
        expected_base=_UNSET,
    ) -> int:
        """replaceWhere-style commit: partitions present in ``df`` are
        replaced, all other files carry over UNTOUCHED — and because the
        swap is a manifest pointer flip, a concurrent reader of the old
        snapshot keeps a complete consistent table throughout (the gap the
        dir-swap merge in operators/incremental.py cannot close).

        Concurrency class: commutes with intervening commits iff they did
        not touch the replaced partition dirs (disjoint-partition writers
        both land, in either order); an overlap raises
        :class:`ConcurrentWriteConflict` — the df was derived from a
        snapshot another writer has since replaced.

        ``txn_id`` (optional) makes the replace exactly-once like
        :meth:`append_once` — a re-delivered foreachBatch re-replace of
        the same partitions is a no-op (Delta's ``txnAppId`` generalizes
        across commit classes the same way).

        ``expected_base`` (optional) is the version ``df`` was DERIVED
        from: conflict detection covers every commit in (expected_base,
        commit_base]. When the caller read a snapshot earlier (e.g.
        :meth:`merge_delete_insert`'s anti-join input), it MUST pass the
        version it read — re-resolving ``latest_version()`` here would
        leave commits landing between that read and this call invisible
        to ``_touched_since`` (a TOCTOU lost-update window). Defaults to
        the current latest for callers whose ``df`` is snapshot-free."""
        if expected_base is self._UNSET:
            expected_base = self.latest_version()
        staged: list[list[str]] = []
        aligned, union = self._evolved(self._with_generated(df))

        def apply(base, m):
            if txn_id is not None and m and txn_id in m.get("txns", []):
                return None  # duplicate delivery → idempotent no-op
            if not staged:  # write data files once, on first need
                staged.append(self._write_files(aligned, partition_by))
            new_files = staged[0]
            replaced_dirs = {os.path.dirname(f) for f in new_files}
            touched = self._touched_since(expected_base, base)
            if "*" in touched or touched & replaced_dirs:
                raise ConcurrentWriteConflict(
                    f"partitions {sorted(touched & replaced_dirs) or '(unknown)'} "
                    f"were modified by a concurrent commit "
                    f"(base v{expected_base} -> v{base})"
                )
            kept = [f for f in (m["files"] if m else []) if os.path.dirname(f) not in replaced_dirs]
            txns = self._base_txns(m)
            if txn_id is not None:
                txns.append(txn_id)
            return kept + new_files, txns, self._rebased_schema_json(m, union)

        return self._publish(apply)

    @_labeled("append_once")
    def append_once(
        self,
        df: DataFrame,
        txn_id: str,
        partition_by: list[str] | None = None,
    ) -> int:
        """Idempotent append: commit ``df`` tagged with ``txn_id``; if the
        CURRENT snapshot already carries that txn id, do nothing and
        return the current version. This is the exactly-once sink
        contract for ``foreachBatch`` (which is at-least-once): pass the
        batch_id and a re-delivered batch becomes a no-op — the same
        txn-dedup Delta's ``txnAppId``/``txnVersion`` provides.

        The txn check runs INSIDE the publish loop, against whatever base
        each attempt sees: a racing duplicate loses the version-slot race,
        rebases, re-checks, and finds the id already committed → no-op.
        (The files it staged become unreferenced orphans; ``vacuum``
        reclaims them.)"""
        self._check_partition_layout(partition_by)
        staged: list[list[str]] = []
        aligned, union = self._evolved(self._with_generated(df))

        def apply(base, m):
            if m and txn_id in m.get("txns", []):
                return None  # duplicate delivery → idempotent no-op
            if not staged:  # write data files once, on first need
                staged.append(self._write_files(aligned, partition_by))
            return (
                (m["files"] if m else []) + staged[0],
                [*self._base_txns(m), txn_id],
                self._rebased_schema_json(m, union),
            )

        return self._publish(apply)

    @_labeled("replace_files")
    def replace_files(
        self,
        remove: list[str],
        df: DataFrame,
        partition_by: list[str] | None = None,
        txn_id: str | None = None,
        data_change: bool = True,
        expected_base=None,
        changes: DataFrame | None = None,
    ) -> int:
        """File-level surgical commit: drop exactly ``remove`` (absolute or
        table-relative paths) from the snapshot and add ``df``'s files;
        every other file carries over BY REFERENCE. This is the erasure /
        compaction primitive — rewrite cost is bounded by the files
        actually touched, never table size (operators/gdpr.py).

        ``data_change=False`` stamps the commit as ROW-PRESERVING (the
        Delta ``dataChange=false`` maintenance flag, VERDICT r10 #1): the
        logical row multiset of the snapshot is unchanged — compaction,
        clustering rewrites, DV materialization. CDF consumers
        (sources/cdf_stream.py) skip flagged versions at O(metadata)
        instead of reading every rewritten byte to prove cancellation;
        ``changes_between`` still proves change-freeness from the data,
        which is exactly how tests keep the flag honest. Callers MUST NOT
        set it on commits that add/drop/modify logical rows.

        ``txn_id`` makes the rewrite exactly-once (maintenance plans are
        re-runnable: a redelivered compaction step no-ops).

        ``expected_base`` is the version ``df``'s rows were READ from
        (defaults to the current latest): the commit aborts if any
        removed file's DELETION VECTORS changed in ``(expected_base,
        commit base]`` — without this, a rewrite derived from a stale
        read silently RESURRECTS rows a concurrent ``delete_where``
        tombstoned (r11 review: the lost-delete race; with
        ``data_change=False`` the divergence would even hide from CDF
        consumers).

        Concurrency class: commutes with commits that leave ``remove``
        and its DVs alone (appends, other-file rewrites, other-file
        deletes); a concurrent commit that removed/rewrote/tombstoned
        any of them → :class:`ConcurrentWriteConflict`.

        ``changes`` (optional, write-side CDF): a DataFrame of this
        commit's NET row changes — the data columns plus
        ``_change_type`` ∈ {'insert', 'delete'} — persisted once under
        ``_changes/`` so CDF readers consume the commit at O(changes)
        instead of re-deriving the diff from the rewritten bytes. The
        caller owns net-ness (a row both removed and re-added must NOT
        appear); ``changes_between`` remains derivation-based and is the
        verification twin. Mutually exclusive with
        ``data_change=False`` (a row-preserving commit has no changes
        by definition — readers already skip it at O(metadata))."""
        if changes is not None and data_change is False:
            raise ValueError(
                "changes= is meaningless on a data_change=False commit — "
                "row-preserving commits are already skipped at O(metadata)"
            )
        rel_remove = {
            os.path.relpath(p, self.path) if os.path.isabs(p) else p for p in remove
        }
        if expected_base is None:
            expected_base = self.latest_version()
        dv_at_read = (
            self._read_manifest(expected_base).get("dv", {})
            if expected_base is not None
            else {}
        )
        df, union = self._evolved(df)
        staged: list[list[str]] = []

        def apply(base, m):
            if txn_id is not None and m and txn_id in m.get("txns", []):
                return None  # duplicate delivery → idempotent no-op
            prev = m["files"] if m else []
            unknown = rel_remove - set(prev)
            if unknown:
                raise ConcurrentWriteConflict(
                    f"not in current snapshot (rewritten or removed by a "
                    f"concurrent commit?): {sorted(unknown)[:3]}"
                )
            dv_now = m.get("dv", {}) if m else {}
            stale = [
                f
                for f in sorted(rel_remove)
                if sorted(dv_now.get(f, [])) != sorted(dv_at_read.get(f, []))
            ]
            if stale:
                raise ConcurrentWriteConflict(
                    f"deletion vectors of removed files changed since the "
                    f"rewrite's read (v{expected_base} -> v{base}) — the "
                    f"rewrite would resurrect concurrently-deleted rows: "
                    f"{stale[:3]}"
                )
            if not staged:  # write data files once, on first need
                staged.append(self._write_files(df, partition_by))
            kept = [f for f in prev if f not in rel_remove]
            txns = self._base_txns(m)
            if txn_id is not None:
                txns.append(txn_id)
            # the declared schema must advance with the union the batch
            # was aligned to (ADVICE r7: dropping it left new columns in
            # the written files but invisible to the explicit read schema
            # — the exact silent loss evolution.py exists to prevent)
            return kept + staged[0], txns, self._rebased_schema_json(m, union)

        self._pending_data_change = data_change
        if changes is not None:
            # apply's DV-staleness abort covers the change rows too: a
            # commit that would invalidate them conflicts instead
            self._staged_cdc = self._write_cdc(changes)
        try:
            return self._publish(apply)
        finally:
            self._pending_data_change = True
            self._staged_cdc = self._UNSET

    def _check_partition_layout(self, partition_by: list[str] | None) -> None:
        """Appending UNPARTITIONED files into a hive-partitioned table (or
        with a different partition spec) produces a mixed layout whose
        basePath read silently mis-resolves the partition columns — rows
        appear to vanish. Delta/Iceberg reject a partition-spec mismatch
        at commit time for the same reason; so do we."""
        existing = self.partition_columns()
        if existing and list(partition_by or []) != existing:
            raise ValueError(
                f"table is hive-partitioned by {existing}; append with "
                f"partition_by={existing} (got {partition_by!r}) — a mixed "
                f"layout would silently corrupt partition resolution"
            )

    def partition_columns(self, version: int | None = None) -> list[str]:
        """Partition columns inferred from the hive-style ``col=value/``
        components of the snapshot's file paths (the manifest stores
        relative paths, so layout is self-describing). Used by erasure /
        compaction (operators/gdpr.py) to rewrite files back INTO their
        partition dirs instead of dumping them at the table root."""
        v = version if version is not None else self.latest_version()
        if v is None:
            return []
        for f in self._read_manifest(v)["files"]:
            parts = [
                c.split("=", 1)[0]
                for c in f.split(os.sep)[:-1]
                if "=" in c and not c.startswith("_")
            ]
            if parts:
                return parts
        return []

    def version_at(self, ts: float) -> int:
        """Newest version committed at-or-before epoch-seconds ``ts`` —
        Delta's ``TIMESTAMP AS OF`` resolution. Commits without a
        recorded ts (pre-r6 manifests) are treated as older than any
        query time. Raises if no version is old enough."""
        candidates = [
            v for v in self._versions()
            # raw doc read — ts is carried on delta docs too, so the
            # whole-history scan never pays snapshot reconstruction
            if self._read_doc(v).get("ts", float("-inf")) <= ts
        ]
        if not candidates:
            raise FileNotFoundError(
                f"no version of {self.path} committed at or before ts={ts}"
            )
        return max(candidates)

    @_labeled("restore")
    def restore(self, version: int) -> int:
        """RESTORE TABLE: commit a NEW version whose file list is the
        target version's — history is preserved (the rolled-back commits
        stay readable), readers flip atomically, and vacuum still
        reclaims anything the restored snapshot doesn't reference. The
        txn set carries FORWARD from the current snapshot (not the
        restored one): exactly-once dedup must remember every delivery
        that ever committed, or a replayed batch would re-append after a
        restore.

        Everything ELSE restores WITH the data (Delta RESTORE semantics):
        declared schema, stats/bloom/cluster/constraint/generated config,
        and the target files' per-file stats + file_meta (the current
        snapshot dropped those maps when the files left it — without
        re-staging them a restore would silently lose file skipping and
        metadata-only maintenance planning). In particular a CHECK
        constraint added AFTER the target does NOT survive a restore to
        before it: it never validated the restored rows, and keeping it
        would poison every future rewrite of files holding a violation
        (the check raises inside compaction's write job, forever)."""
        target = self._read_manifest(version)
        self._pending_stats_columns = target.get("stats_columns") or None
        self._pending_bloom = target.get("bloom") or None
        self._pending_cluster = target.get("cluster_by") or None
        self._pending_constraints = target.get("constraints") or None
        self._pending_generated = target.get("generated") or None
        self._staged_stats.update(target.get("stats", {}))
        self._staged_file_meta.update(target.get("file_meta", {}))
        try:
            return self._publish(
                lambda _base, m: (
                    list(target["files"]),
                    self._base_txns(m),
                    # the target's declared schema (None for legacy
                    # targets → current schema carries forward)
                    target.get("schema"),
                    # restore the TARGET's deletion vectors, not the
                    # current ones pruned: the restored snapshot's logical
                    # content is the target's (files minus its DVs)
                    dict(target.get("dv", {})),
                )
            )
        finally:
            for a in (
                "_pending_stats_columns",
                "_pending_bloom",
                "_pending_cluster",
                "_pending_constraints",
                "_pending_generated",
            ):
                setattr(self, a, self._UNSET)

    @staticmethod
    def _prune_by_partition_values(
        files: list[str], partition_values: dict
    ) -> list[str]:
        """Manifest-level partition pruning: keep files whose hive-style
        path segments match ``{col: allowed values}``. Files lacking a
        ``col=`` segment (pre-partitioning legacy commits) are kept
        conservatively — they may hold any value.

        Matching is over DECODED segments (``_decode_hive_seg``): a NULL
        partition value matches the ``__HIVE_DEFAULT_PARTITION__``
        sentinel and hive-escaped values (space, slash, colon) match
        their unquoted form — ADVICE r10: the raw-segment-vs-``str(v)``
        comparison pruned away exactly the files holding those rows."""
        allowed = {
            col: {_norm_part_value(v) for v in vals}
            for col, vals in partition_values.items()
        }
        out = []
        for f in files:
            keep = True
            segs = _hive_dir_values(os.path.dirname(f))
            for col, vals in allowed.items():
                if col in segs and segs[col] not in vals:
                    keep = False
                    break
            if keep:
                out.append(f)
        return out

    # -- deletion vectors ---------------------------------------------------

    _DV_SCHEMA = "__dv_file string, __dv_pos long"

    def _rel_file_col(self):
        """The scan's ``_metadata.file_path`` (a ``file:`` URI) as a
        table-relative ON-DISK path — the SAME normalization on the write
        side (delete_where) and the read side (the anti-join), so matching
        is by construction.

        The URI percent-encodes path characters (a hive-escaped dir
        ``d=a%2Fb`` arrives as ``d=a%252Fb``, a space as ``%20``), while
        the manifest stores the literal on-disk names — so the URI must
        be DECODED before comparing against manifest entries (ADVICE-r10
        fallout: DV addresses under NULL/escaped partition dirs never
        matched their manifest files). ``url_decode`` also maps ``+`` to
        space (URLDecoder semantics), which a filesystem path must NOT —
        literal ``+`` is first re-escaped to ``%2B`` so it round-trips."""
        p = F.regexp_replace(F.col("_metadata.file_path"), r"^file:/+", "/")
        p = F.url_decode(F.regexp_replace(p, r"\+", "%2B"))
        return F.regexp_replace(p, "^" + re.escape(self.path + os.sep), "")

    def _with_position(self, df: DataFrame) -> DataFrame:
        """Attach (``__dv_file``, ``__dv_pos``): the row's data file
        (table-relative) and its row index within that file — the stable
        physical address deletion vectors are keyed by."""
        return df.select(
            "*",
            self._rel_file_col().alias("__dv_file"),
            F.col("_metadata.row_index").cast("long").alias("__dv_pos"),
        )

    def deleted_positions(self, version: int | None = None) -> DataFrame:
        """The snapshot's deletion-vector relation
        ``(__dv_file, __dv_pos)`` — empty (typed) when no DVs exist."""
        v = version if version is not None else self.latest_version()
        m = self._read_manifest(v) if v is not None else {}
        dv_files = sorted({d for lst in m.get("dv", {}).values() for d in lst})
        if not dv_files:
            return self.spark.createDataFrame([], self._DV_SCHEMA)
        return self.spark.read.schema(self._DV_SCHEMA).parquet(
            *[os.path.join(self.path, d) for d in dv_files]
        )

    @_labeled("delete")
    def delete_where(
        self,
        condition,
        txn_id: str | None = None,
        partition_values: dict | None = None,
        stats_predicates: list | None = None,
    ) -> int:
        """DELETE WHERE without rewriting a single data file: find the
        matching LIVE rows' physical addresses (file, row_index), write
        them as a deletion-vector parquet, and commit a manifest whose
        ``dv`` map points the touched data files at it. Cost is
        O(matching rows) + one pushdown-pruned scan — at 100 TB a GDPR
        erasure of one user touches KBs of DV data instead of rewriting
        every file that holds one of their rows (the Delta/Iceberg
        deletion-vector design; ``materialize_deletes`` is the
        OPTIMIZE-style rewrite that folds DVs back in).

        ``condition``: a Column or SQL string over the table's columns.
        ``partition_values`` prunes the scan's FILE LIST first (same
        contract as :meth:`read`) — pass it when the predicate implies
        partitions. ``stats_predicates`` prunes further by per-file
        min/max stats AND Bloom sidecars (same contract as :meth:`read`)
        — every predicate MUST be implied by ``condition`` (a file
        pruned here is asserted to hold no matching row), which turns a
        point erasure on a clustered/bloom-indexed key into a ~1-file
        scan instead of a table scan. ``txn_id`` makes the delete
        exactly-once.

        Concurrency: commutes with appends and with deletes of OTHER
        rows (two DV commits on the same file union their lists on
        rebase). A concurrent commit that removed/rewrote a touched data
        file invalidates this delete's addresses →
        :class:`ConcurrentWriteConflict`."""
        read_version = self.latest_version()
        if read_version is None:
            raise FileNotFoundError(f"no committed manifest under {self.path}")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        # raw scan (``_metadata`` resolves on file scans only), positions
        # attached FIRST, then already-deleted rows excluded so DVs stay
        # minimal and "matching LIVE rows" is literal
        raw = self.read(
            version=read_version,
            partition_values=partition_values,
            stats_predicates=stats_predicates,
            apply_deletes=False,
        )
        # condition first, already-deleted anti-join on the survivors
        # (same measured ordering lesson as _merge_via_dv: the anti key
        # is the per-row __dv_file regexp); no-DV snapshots skip the
        # anti-join entirely
        dv_at_read = self._read_manifest(read_version).get("dv", {})
        hits_full = self._with_position(raw).filter(cond)
        if dv_at_read:
            hits_full = hits_full.join(
                self.deleted_positions(read_version),
                ["__dv_file", "__dv_pos"],
                "left_anti",
            )
        # the matched rows feed TWO writes (the DV addresses and the
        # commit's change files) — cache so the pruned scan runs once
        hits_full = hits_full.persist()
        # try/finally: an exception from the DV write or _write_cdc must
        # not leak the cached blocks for the session's lifetime
        # (ADVICE r13 #4); unpersist is idempotent on the early return
        try:
            hits = hits_full.select("__dv_file", "__dv_pos")
            stage = os.path.join("_dv", uuid.uuid4().hex[:12])
            os.makedirs(os.path.join(self.path, "_dv"), exist_ok=True)
            hits.write.parquet(os.path.join(self.path, stage))
            dv_files = [
                os.path.join(stage, fn)
                for fn in os.listdir(os.path.join(self.path, stage))
                if fn.endswith(".parquet")
            ]
            touched = sorted(
                r["__dv_file"]  # attribute access would name-mangle in-class
                for r in self.spark.read.schema(self._DV_SCHEMA)
                .parquet(*[os.path.join(self.path, d) for d in dv_files])
                .select("__dv_file")
                .distinct()
                .collect()
            ) if dv_files else []
            if not touched:
                # nothing matched: no-op commit (but still honor txn_id by
                # recording it so a redelivery stays a no-op)
                if txn_id is None:
                    return read_version
                return self._publish(
                    lambda _b, m: None
                    if (m and txn_id in m.get("txns", []))
                    else (list(m["files"]) if m else [], [*self._base_txns(m), txn_id])
                )
            # write-side CDF: the matched rows ARE this commit's net change
            # set — persist them once so CDF readers skip the DV-delta
            # re-read entirely (O(changes), VERDICT r12 next #1)
            data_cols = [
                c for c in hits_full.columns if c not in ("__dv_file", "__dv_pos")
            ]
            cdc_files = self._write_cdc(
                hits_full.select(*data_cols).withColumn(
                    self.CDC_COL, F.lit("delete")
                )
            )
        finally:
            hits_full.unpersist()

        def apply(base, m):
            if txn_id is not None and m and txn_id in m.get("txns", []):
                return None
            cur = set(m["files"]) if m else set()
            missing = [f for f in touched if f not in cur]
            if missing:
                raise ConcurrentWriteConflict(
                    f"data files were removed/rewritten by a concurrent "
                    f"commit; deletion addresses are stale: {missing[:3]}"
                )
            dv = {
                f: list(lst)
                for f, lst in (m.get("dv", {}) if m else {}).items()
                if f in cur
            }
            if any(
                sorted(dv.get(f, [])) != sorted(dv_at_read.get(f, []))
                for f in touched
            ):
                # a concurrent DV commit landed on a touched file since
                # the read. Two PURE deletes commute (position sets union
                # below) — but an UPDATE-class commit (DVs + added
                # postimage files in one commit) does NOT: this delete
                # matched the OLD row address only; committing over the
                # update would tombstone the stale position while the
                # postimage row — which the condition also matches —
                # survives in the new file (resurrection write-skew).
                if self._dv_racing_adds(read_version, base, touched):
                    raise ConcurrentWriteConflict(
                        "delete: a concurrent update/merge both tombstoned "
                        "rows in a touched file and appended replacement "
                        "rows; re-derive against the new snapshot"
                    )
                # pure-delete race: still commutes, but this commit's
                # precomputed change rows may double-count rows the other
                # writer already tombstoned — drop the cdc staging and let
                # CDF readers derive this version's delta from the DV diff
                # instead (correct by construction). cdc is an
                # optimization, never a correctness dependency.
                self._staged_cdc = self._UNSET
            for f in touched:
                dv[f] = dv.get(f, []) + dv_files
            txns = self._base_txns(m)
            if txn_id is not None:
                txns.append(txn_id)
            return list(m["files"]) if m else [], txns, None, dv

        self._staged_cdc = cdc_files
        try:
            return self._publish(apply)
        finally:
            self._staged_cdc = self._UNSET

    @_labeled("update")
    def update_where(
        self,
        condition,
        set: dict,
        txn_id: str | None = None,
        partition_values: dict | None = None,
        stats_predicates: list | None = None,
    ) -> int:
        """UPDATE ... SET without rewriting whole data files: matched
        LIVE rows are tombstoned via deletion vectors and their updated
        images appended as new files — ONE atomic manifest commit, so
        readers never see the delete without the insert. Cost ∝ matched
        rows, zero data-file rewrites (the Delta DV-backed UPDATE shape;
        ``materialize_deletes`` / compaction folds the tombstones in
        later). At 100 TB a one-column touch-up of 0.01% of rows writes
        KBs of addresses + the postimage rows instead of rewriting every
        file holding a match.

        ``set`` maps EXISTING column names to Columns / SQL strings
        evaluated over the pre-update row (unknown columns raise —
        UPDATE never evolves schema; values are cast to the column's
        current type). Updating a partition column works: the postimage
        writes through the table's partition layout, so rows move
        directories. ``txn_id`` makes the update exactly-once;
        ``partition_values`` prunes the matched-row scan's file list and
        ``stats_predicates`` prunes further by per-file min/max + Bloom
        sidecars (both the :meth:`read` contract; each predicate MUST be
        implied by ``condition`` — a pruned file is asserted to hold no
        matching row), so a point update on a clustered key scans ~1
        file, not the table.

        Concurrency: commutes with appends (snapshot semantics — this
        update serializes before a racing insert, which it never claims
        to touch). It does NOT commute with a concurrent tombstone on a
        touched file: unlike two deletes (position sets union), the
        appended postimage would RESURRECT rows a racing delete killed —
        so any DV change or file removal on a touched file aborts and
        RE-DERIVES against the new snapshot (bounded retries), the
        standard OCC loop. Write-side CDF: preimage deletes + postimage
        inserts persist once under ``_changes/`` (bit-equal to the
        derived DV-delta + added-file diff)."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        set_exprs = {
            c: (F.expr(e) if isinstance(e, str) else e) for c, e in set.items()
        }
        last_conflict: ConcurrentWriteConflict | None = None
        for _attempt in range(5):
            read_version = self.latest_version()
            if read_version is None:
                raise FileNotFoundError(f"no committed manifest under {self.path}")
            m0 = self._read_manifest(read_version)
            if txn_id is not None and txn_id in m0.get("txns", []):
                return read_version
            raw = self.read(
                version=read_version,
                partition_values=partition_values,
                stats_predicates=stats_predicates,
                apply_deletes=False,
            )
            # NB: the ``set`` parameter shadows the builtin in this scope
            bad = sorted(c for c in set_exprs if c not in raw.columns)
            if bad:
                raise ValueError(
                    f"update_where: SET names columns not in the table: {bad}"
                )
            # matched LIVE rows only — same ordering as delete_where
            # (condition first, DV anti-join on the survivors)
            dv_at_read = m0.get("dv", {})
            hits_full = self._with_position(raw).filter(cond)
            if dv_at_read:
                hits_full = hits_full.join(
                    self.deleted_positions(read_version),
                    ["__dv_file", "__dv_pos"],
                    "left_anti",
                )
            # the matched rows feed THREE writes (DV addresses, postimage
            # data files, cdc change files) — cache so the scan runs once
            hits_full = hits_full.persist()
            # try/finally: a CHECK-constraint violation in the postimage
            # write (or any DV/cdc write failure) must not leak the
            # cached blocks (ADVICE r13 #4)
            try:
                stage = os.path.join("_dv", uuid.uuid4().hex[:12])
                os.makedirs(os.path.join(self.path, "_dv"), exist_ok=True)
                hits_full.select("__dv_file", "__dv_pos").write.parquet(
                    os.path.join(self.path, stage)
                )
                dv_files = [
                    os.path.join(stage, fn)
                    for fn in os.listdir(os.path.join(self.path, stage))
                    if fn.endswith(".parquet")
                ]
                touched = sorted(
                    r["__dv_file"]
                    for r in self.spark.read.schema(self._DV_SCHEMA)
                    .parquet(*[os.path.join(self.path, d) for d in dv_files])
                    .select("__dv_file")
                    .distinct()
                    .collect()
                ) if dv_files else []
                if not touched:
                    if txn_id is None:  # nothing matched: pure no-op
                        return read_version
                    return self._publish(  # record the txn so redelivery no-ops
                        lambda _b, m: None
                        if (m and txn_id in m.get("txns", []))
                        else (list(m["files"]) if m else [], [*self._base_txns(m), txn_id])
                    )
                data_cols = [
                    c for c in hits_full.columns if c not in ("__dv_file", "__dv_pos")
                ]
                pre = hits_full.select(*data_cols)
                post = pre.select(
                    *[
                        set_exprs[c].cast(pre.schema[c].dataType).alias(c)
                        if c in set_exprs
                        else F.col(c)
                        for c in data_cols
                    ]
                )
                # generated columns recompute from the POST-update row unless
                # the SET clause assigned them explicitly (Delta semantics) —
                # updating ts keeps a derived event_date consistent
                for g, e in self.generated_columns(read_version).items():
                    if g not in set_exprs and g in data_cols:
                        post = post.withColumn(
                            g, F.expr(e).cast(post.schema[g].dataType)
                        )
                part_cols = self.partition_columns(read_version) or None
                files_new = self._write_files(post, part_cols)
                # write-side CDF: preimages out, postimages in — exactly the
                # multiset a reader would derive from DV delta + added files
                # (no cancellation between the two, matching the derivation)
                cdc_files = self._write_cdc(
                    pre.withColumn(self.CDC_COL, F.lit("delete")).unionByName(
                        post.withColumn(self.CDC_COL, F.lit("insert"))
                    )
                )
            finally:
                hits_full.unpersist()

            def apply(base, m, _dv_at_read=dv_at_read, _touched=touched,
                      _dv_files=dv_files, _files_new=files_new):
                if txn_id is not None and m and txn_id in m.get("txns", []):
                    return None
                cur = frozenset(m["files"]) if m else frozenset()
                missing = [f for f in _touched if f not in cur]
                if missing:
                    raise ConcurrentWriteConflict(
                        f"update: data files were removed/rewritten by a "
                        f"concurrent commit; addresses are stale: {missing[:3]}"
                    )
                dv = {
                    f: list(lst)
                    for f, lst in (m.get("dv", {}) if m else {}).items()
                    if f in cur
                }
                if any(
                    sorted(dv.get(f, [])) != sorted(_dv_at_read.get(f, []))
                    for f in _touched
                ):
                    # a racing tombstone may cover rows this update
                    # matched; appending their postimage would resurrect
                    # them — not commutative, unlike delete∘delete
                    raise ConcurrentWriteConflict(
                        "update: concurrent deletion vectors landed on a "
                        "touched file; re-deriving against the new snapshot"
                    )
                for f in _touched:
                    dv[f] = dv.get(f, []) + _dv_files
                txns = self._base_txns(m)
                if txn_id is not None:
                    txns.append(txn_id)
                return (
                    (list(m["files"]) if m else []) + _files_new,
                    txns,
                    None,
                    dv,
                )

            self._staged_cdc = cdc_files
            try:
                return self._publish(apply)
            except ConcurrentWriteConflict as e:
                last_conflict = e  # stale read → re-derive and retry
            finally:
                self._staged_cdc = self._UNSET
        raise last_conflict or ConcurrentWriteConflict("update retries exhausted")

    @_labeled("materialize_deletes")
    def materialize_deletes(
        self, files: list[str] | None = None, txn_id: str | None = None
    ) -> int:
        """OPTIMIZE-style DV fold-in: rewrite the data files that carry
        deletion vectors (or just ``files``) WITHOUT their deleted rows
        and drop their DV entries — bounded by the touched files, never
        table size. Readers flip atomically; ``vacuum`` later reclaims
        the replaced data files and unreferenced DV parquet. ``txn_id``
        makes the fold-in exactly-once (maintenance plans replay safely);
        a DV landing on a target file between this read and the publish
        aborts with :class:`ConcurrentWriteConflict` (replace_files's
        staleness check) instead of resurrecting the new tombstones."""
        v = self.latest_version()
        if v is None:
            return 0
        m = self._read_manifest(v)
        dvmap = m.get("dv", {})
        targets = sorted(dvmap) if files is None else [
            f for f in files if f in dvmap
        ]
        if not targets:
            return v
        cleaned = self.read(version=v, keep_files=set(targets))
        # folding DVs into rewritten files leaves the LIVE row multiset
        # untouched — a dataChange=false maintenance commit by definition
        return self.replace_files(
            targets,
            cleaned,
            partition_by=self.partition_columns(v) or None,
            txn_id=txn_id,
            data_change=False,
            expected_base=v,
        )

    def read(
        self,
        version: int | None = None,
        as_of_ts: float | None = None,
        partition_values: dict | None = None,
        keep_files: set | None = None,
        apply_deletes: bool = True,
        stats_predicates: list[tuple] | None = None,
    ) -> DataFrame:
        """Snapshot read: resolve the manifest ONCE, read exactly its
        files. ``basePath`` makes Spark parse hive-style partition values
        out of the listed file paths — one scan relation with normal
        partition-type inference, pruning, and pushdown, exactly as if the
        directory itself were read (but immune to concurrent commits).
        ``as_of_ts`` (epoch seconds) reads the newest version committed
        at-or-before that time (``TIMESTAMP AS OF``); mutually exclusive
        with ``version``.

        ``partition_values`` (``{col: iterable of allowed values}``) prunes
        the FILE LIST itself before Spark ever sees it — stronger than a
        post-read ``.filter`` (which prunes at scan planning but still
        lists and footer-opens every file): at 100 TB a micro-batch that
        touches 3 of 4096 partitions builds a 3-partition relation, not a
        4096-partition one. Matching is against the hive path segments;
        files without the segment are conservatively included.

        ``keep_files`` (table-relative paths) further intersects the list
        — the hook for data-skipping indexes (``file_bloom_index`` point
        lookups) whose verdicts are per-FILE, not per-partition. The
        caller owns no-false-negative discipline; unknown names are
        simply ignored.

        ``stats_predicates`` (``[(col, op, value)`` or ``(col,
        "between", lo, hi)]``, op ∈ {=, <, <=, >, >=, between}) prunes by
        the manifest's per-file column min/max (:meth:`set_stats_columns`)
        — file skipping with ZERO parquet footer I/O, the complement to
        hive-partition pruning for columns too fine to partition by (and
        the payoff of ``sources/layout.py`` range/Z-order clustering:
        tight per-file ranges). Files without stats are conservatively
        included, and pruning is an OPTIMIZATION, not a filter — apply
        the real ``.filter`` to the returned frame as usual.

        ``apply_deletes``: rows addressed by the snapshot's deletion
        vectors (:meth:`delete_where`) are excluded via an anti-join on
        (file, row_index) — restricted to the DV files of the data files
        actually being read, so partition/file pruning prunes the DV side
        too. The DV side is deleted-rows-sized (small), so AQE broadcasts
        it: no shuffle of the data side. ``apply_deletes=False`` exposes
        the raw physical rows (audit tooling)."""
        if as_of_ts is not None:
            if version is not None:
                raise ValueError("pass version OR as_of_ts, not both")
            version = self.version_at(as_of_ts)
        v = version if version is not None else self.latest_version()
        if v is None:
            raise FileNotFoundError(f"no committed manifest under {self.path}")
        m = self._read_manifest(v)
        files = m["files"]
        if not files:
            raise ValueError(f"manifest v{v} lists no files")
        if partition_values:
            files = self._prune_by_partition_values(files, partition_values)
        if keep_files is not None:
            files = [f for f in files if f in keep_files]
        if stats_predicates:
            files = self._prune_by_stats(
                files, m.get("stats", {}), stats_predicates
            )
            if m.get("bloom"):
                # point-lookup file skipping: probe Bloom sidecars of
                # the files that survived min/max pruning (= / in only)
                files = self._prune_by_bloom(
                    files, stats_predicates, m["bloom"], version=v
                )
        if not files:
            # empty result with the snapshot's declared columns (incl.
            # the partition columns, which live in paths, not footers)
            full = self.read(version=v)
            return full.limit(0)
        paths = [os.path.join(self.path, f) for f in files]
        reader = self.spark.read.option("basePath", self.path)
        if m.get("schema"):
            # the snapshot's declared schema: files predating an additive
            # evolution back-fill NULL for the columns they lack, with no
            # mergeSchema footer sweep (sources/evolution.py)
            reader = reader.schema(StructType.fromJson(m["schema"]))
        df = reader.parquet(*paths)
        dvmap = m.get("dv", {}) if apply_deletes else {}
        dv_files = sorted({d for f in files for d in dvmap.get(f, [])})
        if dv_files:
            cols = df.columns
            dv = (
                self.spark.read.schema(self._DV_SCHEMA)
                .parquet(*[os.path.join(self.path, d) for d in dv_files])
                .filter(F.col("__dv_file").isin(files))
            )
            df = (
                self._with_position(df)
                .join(dv, ["__dv_file", "__dv_pos"], "left_anti")
                .select(*cols)
            )
        return df

    @_labeled("merge")
    def merge_delete_insert(
        self,
        new_batch: DataFrame,
        unique_key: list[str],
        partition_by: list[str],
        txn_id: str | None = None,
        delete_mode: str = "rewrite",
        dv_threshold: float = 0.1,
    ) -> int:
        """The incremental contract on the manifest log: read ONLY the
        affected partitions of the current snapshot, anti-join on the key,
        union the batch, commit via :meth:`replace_partitions`. Readers of
        the pre-merge snapshot are never disturbed; the partition-stable
        key contract matches operators/incremental.py. ``txn_id`` gives
        foreachBatch exactly-once (duplicate delivery → no-op).

        ``delete_mode`` picks how matched OLD rows are removed:

        - ``"rewrite"`` (default, the historical path): affected
          partitions are anti-joined and rewritten — cost ∝ bytes of
          TOUCHED partitions, even when the batch updates one row each.
        - ``"dv"``: matched rows are tombstoned via deletion vectors
          (:meth:`delete_where` machinery) and the batch files are
          APPENDED, all in ONE atomic commit — cost ∝ CHANGED rows (the
          forget_soft two-phase shape: ``materialize_deletes`` /
          compaction folds the DVs in later). At 100 TB this is the
          difference between a trickle-update batch rewriting every
          touched 1 GB file and writing KBs of addresses.
        - ``"auto"``: one counting pass over the affected partitions
          picks ``dv`` when matched_rows ≤ ``dv_threshold`` × live rows
          there, else ``rewrite`` (a high matched fraction means the
          rewrite amortizes and keeps reads DV-free).

        The version the anti-join READ is pinned and handed to
        :meth:`replace_partitions` as ``expected_base``, so a commit
        landing between the read and the publish is inside the conflict
        window (not silently overwritten) — on conflict the merge
        RE-DERIVES against the new snapshot and retries (bounded), the
        standard OCC MERGE loop. The empty-table init path checks
        ``txn_id`` INSIDE the publish loop and falls through to the
        normal merge path if a concurrent first-commit wins the race (so
        overlapping keys from two racing initial batches still anti-join
        instead of double-appending)."""

        class _InitRace(Exception):
            pass

        new_batch = self._with_generated(new_batch)
        last_conflict: ConcurrentWriteConflict | None = None
        for _attempt in range(5):
            read_version = self.latest_version()
            if read_version is None:
                staged: list[list[str]] = []

                def apply(base, m):
                    if base is not None:
                        raise _InitRace()  # lost the init race → merge path
                    if not staged:
                        staged.append(self._write_files(new_batch, partition_by))
                    return (
                        staged[0],
                        ([txn_id] if txn_id else []),
                        evolve_schema(None, new_batch.schema).jsonValue(),
                    )

                try:
                    return self._publish(apply)
                except _InitRace:
                    continue
            if txn_id is not None and txn_id in self._read_manifest(read_version).get(
                "txns", []
            ):
                return read_version
            part_vals = new_batch.select(*partition_by).distinct().collect()
            if not part_vals:
                return read_version
            import functools

            # partition_by=[] (unpartitioned table): the whole table is
            # the affected "partition" — pred folds to TRUE, rewrite mode
            # becomes a full-table replace, DV mode tombstones in place
            # (with the Bloom-sidecar scan pruning doing the real file
            # skipping there)
            pred = functools.reduce(
                lambda a, b: a | b,
                [
                    functools.reduce(
                        lambda a, b: a & b,
                        [F.col(c).eqNullSafe(F.lit(r[c])) for c in partition_by],
                        F.lit(True),
                    )
                    for r in part_vals
                ],
            )
            # align BOTH sides to the evolved union before merging: the
            # batch may carry columns the snapshot predates (additive
            # evolution), and kept rows back-fill NULL for them
            aligned_batch, union = self._evolved(new_batch)
            target = align_to_schema(self.read(read_version), union)
            affected = target.filter(pred)
            keys = aligned_batch.select(*unique_key).distinct()

            mode = delete_mode
            if mode == "auto":
                # ONE counting pass over the affected partitions decides:
                # DV when the batch touches a small fraction of live rows
                row = (
                    affected.join(
                        F.broadcast(keys.withColumn("__m", F.lit(1))),
                        on=unique_key,
                        how="left",
                    )
                    .agg(
                        F.count(F.lit(1)).alias("total"),
                        F.count("__m").alias("matched"),
                    )
                    .first()
                )
                mode = (
                    "dv"
                    if row["total"] > 0 and row["matched"] <= dv_threshold * row["total"]
                    else "rewrite"
                )
            try:
                if mode == "dv":
                    return self._merge_via_dv(
                        read_version,
                        aligned_batch,
                        union,
                        unique_key,
                        partition_by,
                        part_vals,
                        txn_id,
                    )
                kept = affected.join(F.broadcast(keys), on=unique_key, how="left_anti")
                merged = kept.select(*aligned_batch.columns).unionByName(aligned_batch)
                # write-side CDF for the rewrite: net changes are
                # matched\batch deletes + batch\matched inserts — the
                # mutual exceptAll makes an idempotent re-upsert of
                # identical rows net to ZERO, exactly like the derived
                # file diff ((kept ⊎ batch) \ (kept ⊎ matched) = batch \
                # matched as multisets), so cdc output is bit-equal to
                # what a CDF reader would re-derive from the files.
                matched = affected.join(
                    F.broadcast(keys), on=unique_key, how="left_semi"
                ).select(*aligned_batch.columns)
                self._staged_cdc = self._write_cdc(
                    matched.exceptAll(aligned_batch)
                    .withColumn(self.CDC_COL, F.lit("delete"))
                    .unionByName(
                        aligned_batch.exceptAll(matched).withColumn(
                            self.CDC_COL, F.lit("insert")
                        )
                    )
                )
                try:
                    return self.replace_partitions(
                        merged, partition_by, txn_id=txn_id, expected_base=read_version
                    )
                finally:
                    self._staged_cdc = self._UNSET
            except ConcurrentWriteConflict as e:
                last_conflict = e  # stale read → re-derive on the new snapshot
        raise last_conflict or ConcurrentWriteConflict("merge retries exhausted")

    def _merge_via_dv(
        self,
        read_version: int,
        aligned_batch: DataFrame,
        union: StructType,
        unique_key: list[str],
        partition_by: list[str],
        part_vals,
        txn_id: str | None,
    ) -> int:
        """DV half of MERGE: tombstone matched LIVE rows by physical
        address and append the batch files — ONE atomic manifest commit,
        so readers never see the delete without the insert (or vice
        versa). Cost ∝ matched rows + batch bytes; zero data-file
        rewrites.

        Conflict window (same contract as the rewrite path, ADVICE r10):
        a commit is aborted with :class:`ConcurrentWriteConflict` when a
        tombstoned data file left the snapshot (stale addresses) OR when
        ANY commit in ``(read_version, commit base]`` touched an affected
        partition dir — a racing append/merge may have inserted rows with
        the same unique key that this merge's anti-state never saw;
        committing over it would leave duplicate keys. The caller's
        re-derive loop then recomputes against the new snapshot, exactly
        as ``replace_partitions(expected_base=...)`` forces on the
        rewrite path."""
        partition_values = {
            c: sorted({r[c] for r in part_vals}, key=str) for c in partition_by
        }
        keys = aligned_batch.select(*unique_key).distinct()
        # Bloom file skipping for the matched-row scan: a point-update
        # batch (≤ _BLOOM_MERGE_KEY_CAP distinct keys) on a bloom-indexed
        # key probes each candidate file's sidecar and scans ONLY files
        # that may contain a batch key — on an unpartitioned 100 TB
        # table this is the difference between scanning the table and
        # scanning ~len(keys) files. Guards (oversized batch, NULL or
        # non-int/str keys, unindexed column, sidecar-less file) all
        # fall back to the unpruned scan — never a lost match.
        keep = None
        bcfg = self._read_manifest(read_version).get("bloom")
        if bcfg and all(c in bcfg.get("columns", []) for c in unique_key):
            key_rows = keys.limit(self._BLOOM_MERGE_KEY_CAP + 1).collect()
            if len(key_rows) <= self._BLOOM_MERGE_KEY_CAP:
                # materialize the key set ONCE and reuse it for both the
                # sidecar probe and the semi-join below (ADVICE r11 #3:
                # re-evaluating a non-deterministic source batch could
                # produce join-time keys absent from the probed set —
                # their files were pruned, their rows never tombstoned)
                keys = self.spark.createDataFrame(key_rows, keys.schema)
                cand = self._bloom_candidate_files(
                    self._read_manifest(read_version)["files"],
                    key_rows,
                    unique_key,
                    bcfg,
                    version=read_version,
                )
                keep = set(cand) if cand is not None else None
        raw = self.read(
            version=read_version,
            partition_values=partition_values,
            keep_files=keep,
            apply_deletes=False,
        )
        # key semi-join FIRST, already-deleted anti-join on the survivors:
        # the anti-join's key is __dv_file (a per-row regexp over
        # _metadata.file_path) — below the semi it runs on matched rows
        # only; above it, on every row (measured 11.5 s vs 2.3 s over 38M
        # rows). Skipped entirely when the snapshot carries no DVs.
        hits_full = self._with_position(raw).join(
            F.broadcast(keys), on=unique_key, how="left_semi"
        )
        if self._read_manifest(read_version).get("dv"):
            hits_full = hits_full.join(
                self.deleted_positions(read_version),
                ["__dv_file", "__dv_pos"],
                "left_anti",
            )
        # matched rows feed the DV addresses AND the commit's change
        # files — cache so the pruned scan runs once
        hits_full = hits_full.persist()
        # try/finally: DV-write/cdc failures must not leak the cached
        # blocks (ADVICE r13 #4)
        try:
            hits = hits_full.select("__dv_file", "__dv_pos")
            stage = os.path.join("_dv", uuid.uuid4().hex[:12])
            os.makedirs(os.path.join(self.path, "_dv"), exist_ok=True)
            hits.write.parquet(os.path.join(self.path, stage))
            dv_files = [
                os.path.join(stage, fn)
                for fn in os.listdir(os.path.join(self.path, stage))
                if fn.endswith(".parquet")
            ]
            touched = sorted(
                r["__dv_file"]
                for r in self.spark.read.schema(self._DV_SCHEMA)
                .parquet(*[os.path.join(self.path, d) for d in dv_files])
                .select("__dv_file")
                .distinct()
                .collect()
            ) if dv_files else []
            # write-side CDF: deletes = the tombstoned rows (aligned to the
            # union schema, exactly what the DV-delta derivation would emit),
            # inserts = the batch rows (same multiset as the added files).
            # No cancellation between the two — the derived diff appends
            # DV-delta deletes without cancelling against added-file inserts,
            # and the cdc files must be bit-equal to it.
            data_cols = [c for c in raw.columns]
            cdc_files = self._write_cdc(
                align_to_schema(hits_full.select(*data_cols), union)
                .withColumn(self.CDC_COL, F.lit("delete"))
                .unionByName(
                    aligned_batch.withColumn(self.CDC_COL, F.lit("insert"))
                )
            )
        finally:
            hits_full.unpersist()
        files_new = self._write_files(aligned_batch, partition_by)

        # decoded allowed values per partition column, for the
        # concurrent-commit overlap check below
        affected_vals = {
            c: {_norm_part_value(r[c]) for r in part_vals} for c in partition_by
        }

        def _overlaps_affected(dirs: set[str]) -> list[str]:
            hits = []
            for d in dirs:
                if d == "*":
                    return ["*"]
                segs = _hive_dir_values(d)
                # a dir overlaps unless some partition column PROVES
                # disjointness; dirs lacking the column are conservative
                if all(
                    c not in segs or segs[c] in vals
                    for c, vals in affected_vals.items()
                ):
                    hits.append(d)
            return hits

        def apply(base, m):
            if txn_id is not None and m and txn_id in m.get("txns", []):
                return None
            cur = set(m["files"]) if m else set()
            missing = [f for f in touched if f not in cur]
            if missing:
                raise ConcurrentWriteConflict(
                    f"merge(dv): tombstoned data files were removed/"
                    f"rewritten by a concurrent commit: {missing[:3]}"
                )
            raced = _overlaps_affected(self._touched_since(read_version, base))
            if raced:
                # a concurrent commit added/removed files in an affected
                # partition — it may carry this merge's unique keys, which
                # the anti-state derived at read_version never saw
                raise ConcurrentWriteConflict(
                    f"merge(dv): affected partitions were modified by a "
                    f"concurrent commit (base v{read_version} -> v{base}): "
                    f"{sorted(raced)[:3]}"
                )
            dv = {
                f: list(lst)
                for f, lst in (m.get("dv", {}) if m else {}).items()
                if f in cur
            }
            for f in touched:
                dv[f] = dv.get(f, []) + dv_files
            txns = self._base_txns(m)
            if txn_id is not None:
                txns.append(txn_id)
            return (
                (list(m["files"]) if m else []) + files_new,
                txns,
                self._rebased_schema_json(m, union),
                dv,
            )

        # apply aborts on ANY concurrent touch of an affected partition
        # (file or DV), so a cdc that publishes is never stale
        self._staged_cdc = cdc_files
        try:
            return self._publish(apply)
        finally:
            self._staged_cdc = self._UNSET

    def clone_to(self, dest_path: str, version: int | None = None) -> "ManifestTable":
        """CLONE TABLE at O(metadata) cost: hardlink the snapshot's data
        and DV files into ``dest_path`` and publish a fresh v1 manifest
        there (same file list, schema, stats, deletion vectors; a FRESH
        txn set — the clone is a new pipeline destination, not a resumed
        one). Hardlinks make this a DEEP clone at shallow-clone cost on
        one filesystem: the clone owns its bytes (link count), so
        vacuuming either table can never invalidate the other — the
        cross-table dangling-file hazard shallow clones carry by design
        simply doesn't exist. Parquet files are never mutated in place
        (manifest tables write-once), so shared inodes are safe.

        Classic uses: zero-cost dev/staging copies of a production table,
        snapshot hand-off to an experiment, pre-migration backups."""
        v = version if version is not None else self.latest_version()
        if v is None:
            raise FileNotFoundError(f"no committed manifest under {self.path}")
        m = self._read_manifest(v)
        dest = ManifestTable(self.spark, dest_path)
        if dest.latest_version() is not None:
            raise FileExistsError(f"{dest_path} already has a committed manifest")
        import glob as _glob

        to_link = list(m["files"]) + sorted(
            {d for lst in m.get("dv", {}).values() for d in lst}
        )
        # Bloom sidecars ride along with their data files
        to_link += [
            os.path.relpath(p, self.path)
            for rel in m["files"]
            for p in _glob.glob(
                _glob.escape(os.path.join(self.path, rel)) + ".bloom.*"
            )
        ]
        for rel in to_link:
            src = os.path.join(self.path, rel)
            dst = os.path.join(dest.path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src, dst)
            except OSError:
                import shutil

                shutil.copy2(src, dst)  # cross-device fallback
        doc_stats = m.get("stats", {})
        dest._staged_stats.update(doc_stats)
        dest._staged_file_meta.update(m.get("file_meta", {}))
        if m.get("stats_columns"):
            dest._pending_stats_columns = list(m["stats_columns"])
        if m.get("bloom"):
            dest._pending_bloom = dict(m["bloom"])
        # the declarative config clones too — a copy that silently
        # dropped its CHECK constraints / generated columns / clustering
        # would accept writes the source never would (same metadata-
        # travels-with-data rule as restore)
        if m.get("cluster_by"):
            dest._pending_cluster = list(m["cluster_by"])
        if m.get("constraints"):
            dest._pending_constraints = dict(m["constraints"])
        if m.get("generated"):
            dest._pending_generated = dict(m["generated"])
        dest._pending_op = "clone"
        try:
            dest._publish(
                lambda _b, _m: (
                    list(m["files"]),
                    [],
                    m.get("schema"),
                    {f: list(lst) for f, lst in m.get("dv", {}).items()},
                )
            )
        finally:
            dest._pending_stats_columns = dest._UNSET
            dest._pending_bloom = dest._UNSET
            dest._pending_cluster = dest._UNSET
            dest._pending_constraints = dest._UNSET
            dest._pending_generated = dest._UNSET
            dest._pending_op = None
        return dest

    def changes_between(self, v_from: int, v_to: int) -> DataFrame:
        """Change Data Feed: the ROW-LEVEL difference between two
        committed snapshots as a DataFrame of the table's columns plus
        ``_change_type`` ∈ {'insert', 'delete'} (an update surfaces as
        delete(old row) + insert(new row), Delta CDF's
        preimage/postimage pair).

        Cost is bounded by the CHANGED files, never table size: files
        present in both snapshots contribute nothing (immutable files ⇒
        identical rows cancel by construction) except where their
        deletion vectors differ — those contribute exactly the
        newly-deleted / resurrected positions. Added-vs-removed file rows
        go through a multiset difference (``exceptAll``), so a rewrite
        that preserves rows — compaction, Z-order clustering, DV
        materialization — nets to ZERO changes without any
        ``dataChange=false`` commit flag: change-freeness is PROVED from
        the data, not asserted by the writer.

        Schema evolution between the versions is handled by aligning the
        older side to the union schema (added columns back-fill NULL,
        exactly what a reader of the old snapshot would see today)."""
        if not v_from <= v_to:
            raise ValueError("v_from must be <= v_to")
        m1, m2 = self._read_manifest(v_from), self._read_manifest(v_to)
        f1, f2 = set(m1["files"]), set(m2["files"])
        added, removed, common = f2 - f1, f1 - f2, f1 & f2

        union = evolve_schema(
            self.declared_schema(v_from) or self.read(version=v_from).schema,
            self.declared_schema(v_to) or self.read(version=v_to).schema,
        )

        def aligned(df: DataFrame) -> DataFrame:
            return align_to_schema(df, union)

        ins_raw = aligned(self.read(version=v_to, keep_files=added))
        del_raw = aligned(self.read(version=v_from, keep_files=removed))
        inserts = ins_raw.exceptAll(del_raw)
        deletes = del_raw.exceptAll(ins_raw)

        # common files: only deletion-vector deltas matter
        def _dv_pos(m: dict) -> DataFrame:
            lst = sorted(
                {d for f in common for d in m.get("dv", {}).get(f, [])}
            )
            if not lst:
                return self.spark.createDataFrame([], self._DV_SCHEMA)
            return (
                self.spark.read.schema(self._DV_SCHEMA)
                .parquet(*[os.path.join(self.path, d) for d in lst])
                .filter(F.col("__dv_file").isin(list(common)))
                .distinct()
            )

        if common and (m1.get("dv") or m2.get("dv")):
            pos1, pos2 = _dv_pos(m1), _dv_pos(m2)
            newly_deleted = pos2.subtract(pos1)
            resurrected = pos1.subtract(pos2)
            raw = self._with_position(
                self.read(version=v_to, keep_files=common, apply_deletes=False)
            )
            cols = [c for c in raw.columns if c not in ("__dv_file", "__dv_pos")]
            dv_del = aligned(
                raw.join(newly_deleted, ["__dv_file", "__dv_pos"], "left_semi")
                .select(*cols)
            )
            dv_ins = aligned(
                raw.join(resurrected, ["__dv_file", "__dv_pos"], "left_semi")
                .select(*cols)
            )
            deletes = deletes.unionByName(dv_del)
            inserts = inserts.unionByName(dv_ins)

        return inserts.withColumn(
            "_change_type", F.lit("insert")
        ).unionByName(deletes.withColumn("_change_type", F.lit("delete")))

    def history(self) -> DataFrame:
        """DESCRIBE HISTORY: one row per retained version — commit
        wall-clock, base version, files added/removed vs the base (or vs
        the previous RETAINED version when the base was vacuumed), net
        file count, whether the commit touched deletion vectors, and the
        txn ids it introduced. Pure manifest metadata (KBs at any table
        size); the operational commit-audit surface Delta exposes the
        same way.

        Cost: ONE incremental fold over the raw log — each delta doc
        applies in O(its changes) onto the running snapshot instead of
        reconstructing every version from its checkpoint chain (which
        made a long-history audit O(versions × snapshot)); checkpoint
        docs resolve once each. Scalars (ts/op/base_version) are
        per-doc authoritative in both doc classes (mlog._SCALARS), so
        the fold reads them off the running snapshot directly."""
        rows = []
        prev_files: set[str] = set()
        prev_txns: set[str] = set()
        prev_dv: dict = {}
        snap: dict = {}
        for v in self._versions():
            d = self._read_doc(v)
            snap = (
                mlog.resolve_full(d, self.path)
                if mlog.is_full(d)
                else mlog.apply_delta(snap, d)
            )
            cur = set(snap["files"])
            cur_txns = set(snap.get("txns", []))
            cur_dv = snap.get("dv", {})
            rows.append(
                (
                    v,
                    snap.get("ts"),
                    # operation label the committing method stamped
                    # (r11; None for legacy/raw commits)
                    snap.get("op"),
                    snap.get("base_version"),
                    len(cur - prev_files),
                    len(prev_files - cur),
                    len(cur),
                    cur_dv != prev_dv,
                    sorted(cur_txns - prev_txns),
                )
            )
            prev_files, prev_txns, prev_dv = cur, cur_txns, cur_dv
        return self.spark.createDataFrame(
            rows,
            "version int, ts double, op string, base_version int, "
            "files_added int, files_removed int, files_total int, "
            "dv_changed boolean, new_txns array<string>",
        )

    def vacuum(
        self,
        keep_versions: int = 1,
        tmp_grace_sec: float = 3600.0,
        protect_versions_from=None,
        keep_hours: float | None = None,
    ) -> int:
        """Delete data files unreferenced by the newest ``keep_versions``
        manifests (and drop older manifests). Returns files removed.

        ``keep_hours`` (Delta's time-based retention): additionally
        retain every version committed within the last ``keep_hours``
        hours — an AGE floor composed with the count floor and the
        consumer anchors (retention only ever widens), so "keep 7 days"
        holds regardless of commit rate. Versions without a recorded ts
        (pre-r6 manifests) count as old.

        Also reclaims ``*.tmp`` manifest files older than
        ``tmp_grace_sec``: a writer crashing between ``os.link`` and
        ``os.unlink(tmp)`` (or before the link) strands its tmp file, and
        nothing else references it. The grace period keeps vacuum from
        yanking a tmp an in-flight commit is about to link. Unreferenced
        parquet checkpoint side files (``cp-*.parquet``) follow the same
        grace rule.

        ``protect_versions_from`` (VERDICT r11 next #7 — the vacuum↔CDF
        retention foot-gun): a list of consumer anchors, each either an
        explicit manifest VERSION (int) or a Structured Streaming
        CHECKPOINT DIR (str) of a live ``manifest_cdf`` stream. Every
        manifest at or above the lowest anchor is retained IN ADDITION
        to the newest ``keep_versions``, so a restart-from-checkpoint
        can always replay its next batch: a CDF batch over
        ``(start, end]`` reconstructs snapshots down to ``start`` (the
        floor is the second-newest offset the checkpoint holds — the
        last batch may be planned-but-uncommitted and is replayed from
        there on restart). Without anchors, retention is purely
        ``keep_versions`` and the documented contract applies: set
        ``keep_versions`` ≥ 1 + the maximum number of commits any live
        consumer can lag, or register the consumer here."""
        import time

        now = time.time()
        for fn in self.store.list(self.manifest_dir):
            if fn.endswith(".tmp"):
                p = os.path.join(self.manifest_dir, fn)
                try:
                    if now - self.store.mtime(p) > tmp_grace_sec:
                        self.store.delete(p)
                except FileNotFoundError:
                    pass  # the owning writer just cleaned it up
        vs = self._versions()
        if not vs:
            return 0
        floor = vs[-keep_versions:][0]
        if keep_hours is not None:
            cutoff = now - keep_hours * 3600.0
            aged = [
                v
                for v in vs
                # raw doc read — ts rides every delta doc, no
                # reconstruction (same walk as version_at)
                if self._read_doc(v).get("ts", float("-inf")) >= cutoff
            ]
            if aged:
                floor = min(floor, aged[0])
        if protect_versions_from:
            from ecommerce_analytics_platform_spark.sources.cdf_stream import (
                consumer_floor,
            )

            for anchor in protect_versions_from:
                af = (
                    anchor
                    if isinstance(anchor, int)
                    else consumer_floor(anchor, store=self.store)
                )
                if af is not None:
                    floor = min(floor, af)
        keep = [v for v in vs if v >= floor]
        # the oldest retained version may be a DELTA doc whose chain runs
        # through manifests we are about to drop — rewrite it as a full
        # checkpoint first (content-equivalent, so the atomic rename is
        # invisible to concurrent readers), keeping the invariant that
        # every retained version reconstructs from retained docs alone
        oldest = keep[0]
        if not mlog.is_full(self._read_doc(oldest)):
            snap = self._read_manifest(oldest)
            out_doc = mlog.encode_full(snap, self.path)
            tmp = os.path.join(self.manifest_dir, f"{uuid.uuid4().hex}.tmp")
            with open(tmp, "w") as f:
                f.write(json.dumps(out_doc, indent=1))
            os.rename(tmp, os.path.join(self.manifest_dir, f"v{oldest}.json"))
        live: set[str] = set()
        for v in keep:
            # liveness needs files + dv (+ scalar cdc) — skip stats and
            # file_meta decode on parquet-checkpoint tables
            mk = self._read_manifest(v, columns=("dv",))
            live.update(mk["files"])
            # deletion-vector parquet referenced by kept snapshots is as
            # live as the data files it addresses
            for lst in mk.get("dv", {}).values():
                live.update(lst)
            # commit-time change files of retained versions: a CDF
            # consumer replaying a retained version reads them
            live.update(mk.get("cdc", []))
        # current Bloom geometry tag: sidecars of LIVE files whose name
        # carries a DIFFERENT tag were built under an older (m_bits, k,
        # seed) — already ignored by every probe; vacuum reclaims them
        bcfg_now = self._read_manifest(keep[-1]).get("bloom")
        cur_tag = f".{self._bloom_tag(bcfg_now)}" if bcfg_now else None
        # change files of versions being DROPPED this pass: their docs
        # are still on disk here (docs are deleted after the walk), so
        # they are positively identifiable and reclaimed immediately —
        # this is also the GDPR contract (forget_hard's vacuum must
        # physically erase the deleted rows' bytes from _changes/, not
        # leave them behind a grace window). Only cdc files referenced
        # by NO doc at all (an in-flight commit's staging, or a crashed
        # loser's) get the grace window.
        dropped_cdc: set[str] = set()
        for v in vs:
            if v < floor:
                try:
                    dropped_cdc.update(self._read_doc(v).get("cdc", []))
                except FileNotFoundError:
                    pass
        removed = 0
        now_walk = time.time()
        for root, _dirs, files in os.walk(self.path):
            if os.path.basename(root) == "_manifests":
                continue
            for fn in files:
                rel = os.path.relpath(os.path.join(root, fn), self.path)
                if fn.endswith(".parquet") and rel not in live:
                    if rel.split(os.sep, 1)[0] == "_changes" and rel not in dropped_cdc:
                        # unreferenced by ANY doc: an IN-FLIGHT commit's
                        # staging (written before its publish) — the
                        # same grace window that protects tmp manifests
                        p = os.path.join(root, fn)
                        try:
                            if now_walk - os.path.getmtime(p) > tmp_grace_sec:
                                os.unlink(p)
                                removed += 1
                        except FileNotFoundError:
                            pass
                        continue
                    os.unlink(os.path.join(root, fn))
                    removed += 1
                elif ".parquet.bloom." in fn:
                    p = os.path.join(root, fn)
                    if fn.endswith(".tmp"):
                        # stranded atomic-write tmp (writer crashed
                        # between write and rename): same grace rule as
                        # manifest tmps
                        try:
                            if time.time() - os.path.getmtime(p) > tmp_grace_sec:
                                os.unlink(p)
                        except FileNotFoundError:
                            pass
                    elif rel.rsplit(".bloom.", 1)[0] not in live:
                        # Bloom sidecar: live iff its data file is live
                        os.unlink(p)
                    elif cur_tag and not fn.endswith(cur_tag):
                        # live data file, but the sidecar's geometry tag
                        # is not the current config's — a stale bitmap
                        # whose bits were set under different (m_bits,
                        # k, seed); probes already treat it as missing
                        # (ADVICE r11 #1), vacuum reclaims it. Grace
                        # window (ADVICE r12 #3): a set_bloom_columns
                        # geometry change + backfill racing this vacuum
                        # writes NEW-tag sidecars our snapshot of the
                        # config predates — young differently-tagged
                        # sidecars are kept for the next pass.
                        try:
                            if now_walk - os.path.getmtime(p) > tmp_grace_sec:
                                os.unlink(p)
                        except FileNotFoundError:
                            pass
        for v in [v for v in vs if v < floor]:
            os.unlink(os.path.join(self.manifest_dir, f"v{v}.json"))
        # parquet checkpoint side files: live iff a retained doc points
        # at them; unreferenced ones (dropped versions, crashed publish
        # losers) are reclaimed past the same grace window that protects
        # an in-flight publish between its side-file write and its link
        referenced = {
            self._read_doc(v).get("checkpoint") for v in keep
        } - {None}
        now = time.time()
        for fn in os.listdir(self.manifest_dir):
            if fn.startswith("cp-") and fn.endswith(".parquet") and fn not in referenced:
                p = os.path.join(self.manifest_dir, fn)
                try:
                    if now - os.path.getmtime(p) > tmp_grace_sec:
                        os.unlink(p)
                except FileNotFoundError:
                    pass
        return removed
