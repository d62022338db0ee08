"""Versioned snapshot tables: ACID-ish parquet without connector jars.

The reference's users get transactional tables from the backend RDBMS
(`/root/reference/datum/postgis/table.py` — every write runs in a DB
transaction); a Spark deployment normally reaches for Delta/Iceberg,
whose jars this runtime does not ship (`sources/registry.py` gates
them).  This module supplies the load-bearing subset of that behavior
with nothing but parquet + an atomically-published manifest, the same
core design as Iceberg's metadata tree cut down to one level:

- layout::

      <path>/data/<commit-token>/part-*.parquet   (immutable once written)
      <path>/_manifests/v{N:012d}.json            (file list per version)

- COMMIT = write data files into a fresh commit directory, then publish
  ``v{N}.json`` via ``os.link`` of a temp file — atomic create-exclusive
  on POSIX, so readers see either the old version or the new one, never
  a partial file list, and two committers can never both win version N.
- SNAPSHOT ISOLATION = a reader resolves one manifest and reads only
  the files it lists; data files are never mutated or appended to, so a
  long query is unaffected by later commits (until ``vacuum`` reclaims
  files its retained manifests no longer reference).
- TIME TRAVEL = ``read(version=...)`` / ``read(as_of=<unix ts>)``.
- CONFLICTS: an ``append``'s file list is parent-independent, so losing
  the race just re-bases onto the new head.  ``merge`` / ``delete_where``
  / ``compact`` DERIVE their file list from the snapshot they read — on
  conflict the stale rewrite is discarded and RECOMPUTED from the new
  head (republishing it would silently drop the concurrent commit's
  rows, the classic lost update).  ``overwrite`` replaces the table
  regardless of its parent, so retrying the same files at the next
  version is its intended last-writer-wins semantics.

Each manifest additionally records:

- the DataFrame SCHEMA (json), so an empty snapshot (v0, or after a
  delete-all) still reads with its typed columns.  The schema EVOLVES
  additively (Iceberg semantics, name-mapped): an append may add new
  nullable columns or omit existing ones, ``add_columns`` /
  ``drop_columns`` are metadata-only commits, same-name type changes
  raise :class:`SchemaConflict`, and every read is pinned to its
  version's recorded schema — time travel returns each version with
  the schema it had;
- per-file COLUMN STATS (min/max/null-count from the parquet footers),
  the Iceberg-style scan-pruning metadata: ``read(where=...)`` skips
  files the predicate provably cannot match, and ``merge`` /
  ``delete_where`` rewrite ONLY the files that may contain affected
  rows — untouched files are carried by reference, turning COW cost
  from O(table) to O(matching files).

Scale posture: manifests are DELTAS (r10) — each commit doc stores the
files added/removed vs its parent, so an ``append`` writes O(new
files) of metadata whatever the table size (pre-r10 every commit
rewrote the full file list: ~145 B/file → ~140 MB per commit at 10⁶
files).  Stats collection reads one parquet FOOTER per new file
(driver-side, ~KB each).  Reads resolve the head as nearest BASE +
tail deltas, where a base is a periodic checkpoint embedding the full
file list (``checkpoint_interval``, default 100 — the amortized O(N)
write, paid once per interval like Iceberg's manifest compaction) —
so resolution is O(interval) small JSON reads, cached per instance.
The same checkpoints fold per-producer txn high-water marks
(``append_once`` idempotence, the Delta ``_last_checkpoint`` pattern,
measured flat across a 1,000-commit sweep — SCALE.md §20; the
manifest sweep is §23).  Remaining cap: resolution materializes the
file list in driver memory (~10⁸ files ≈ 10 GB) — the point where
real deployments move to Iceberg/Delta proper (and `registry.py`'s
gates lift); everything above the format is unchanged by that swap.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
import warnings

from pyspark.sql import DataFrame, SparkSession


class VacuumAbortedWarning(UserWarning):
    """Vacuum's manifest phase aborted (the horizon txn-fold checkpoint
    could not be durably written) — nothing was deleted and manifests
    keep accumulating until a later vacuum succeeds.  Emitted so
    maintenance jobs can distinguish "aborted" from "nothing to do"
    (both return an empty ``removed`` list); filter it to an error in
    ops tooling to page on repeated failures."""


class CommitConflict(RuntimeError):
    """Another writer published this version first (after retries)."""


class SchemaConflict(ValueError):
    """An append/merge redefines an existing column with a different
    type.  Name-mapped parquet cannot read a file's int32 as a string;
    widen via an explicit rewrite instead."""


def _merge_schema_json(parent: dict | None, new: dict | None) -> dict | None:
    """Additive schema evolution (Iceberg semantics, name-mapped):
    columns union by NAME, same-name columns must keep their type, and
    any column absent from either side becomes nullable (files that
    predate it read it as NULL).  Raises :class:`SchemaConflict` on a
    type change — without parquet field IDs a type rewrite cannot be
    resolved at read time."""
    if parent is None:
        return new
    if new is None:
        return parent
    new_by_name = {f["name"]: f for f in new["fields"]}
    fields = []
    for f in parent["fields"]:
        g = new_by_name.pop(f["name"], None)
        f = dict(f)
        if g is None:
            f["nullable"] = True          # absent from the new files
        elif g["type"] != f["type"]:
            raise SchemaConflict(
                f"column {f['name']!r}: {f['type']} -> {g['type']}")
        else:
            f["nullable"] = bool(f.get("nullable") or g.get("nullable"))
        fields.append(f)
    for f in new["fields"]:               # brand-new columns, in order
        if f["name"] in new_by_name:
            f = dict(f)
            f["nullable"] = True          # absent from every old file
            fields.append(f)
    return {"type": "struct", "fields": fields}


# columns stats are kept for: parquet footer min/max types that survive
# a JSON round-trip with comparison semantics intact
_STATS_OK = (int, float, str, bool)


def _file_column_stats(path: str) -> dict:
    """Per-column ``{min, max, nulls, rows}`` from one parquet footer
    (top-level atomic columns only).  DATE columns keep ISO min/max and
    are tagged ``t: "date"`` — :func:`file_may_match` then only prunes
    them against literals that are themselves pure ``YYYY-MM-DD`` text
    (ISO dates order lexicographically = chronologically).  TIMESTAMP
    columns emit NO min/max (``exact`` stays False): Spark evaluates
    ``ts <= '2024-06-01'`` by CASTING the literal in the session
    timezone with sub-second precision, and a lexicographic compare of
    ``str(datetime)`` against the raw literal wrongly prunes boundary
    files (e.g. min ``2024-06-01 00:00:00`` > literal ``2024-06-01``
    as strings) — so pruning never fires on them."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    agg: dict[str, dict] = {}

    def norm(v):
        """→ (comparable value | None, temporal tag | None)."""
        if isinstance(v, bytes):
            try:
                return v.decode("utf-8"), None
            except UnicodeDecodeError:
                return None, None
        if isinstance(v, _STATS_OK):
            return v, None
        try:                         # datetime.date / datetime / Decimal
            import datetime
            import decimal

            if isinstance(v, decimal.Decimal):
                return float(v), None
            if isinstance(v, datetime.datetime):
                return None, None    # session-tz cast semantics: no prune
            if isinstance(v, datetime.date):
                return v.isoformat(), "date"
        except Exception:
            pass
        return None, None

    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            if "." in name:          # nested leaves: skip
                continue
            st = c.statistics
            cur = agg.setdefault(name, {"min": None, "max": None,
                                        "nulls": 0, "rows": 0,
                                        "exact": True})
            cur["rows"] += c.num_values
            if st is None:
                cur["exact"] = False       # no stats → never prune on it
                continue
            cur["nulls"] += int(st.null_count or 0) \
                if st.has_null_count else 0
            if not st.has_null_count:
                cur["exact"] = False
            if st.has_min_max:
                (lo, tlo), (hi, thi) = norm(st.min), norm(st.max)
                if lo is None or hi is None:
                    cur["exact"] = False
                else:
                    if tlo or thi:
                        cur["t"] = tlo or thi
                    cur["min"] = lo if cur["min"] is None \
                        else min(cur["min"], lo)
                    cur["max"] = hi if cur["max"] is None \
                        else max(cur["max"], hi)
            else:
                cur["exact"] = False
    return agg


# -- conservative predicate-vs-stats evaluation ------------------------------
#
# A tiny grammar (top-level AND of comparisons / BETWEEN / IN / IS NULL)
# is enough for partition-style pruning predicates; ANYTHING else parses
# to None and prunes nothing — correctness never depends on the parser,
# only prune effectiveness does.

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_NUM = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
_LIT = rf"(?:{_NUM}|'[^']*')"
_TERM = (rf"(?:({_IDENT})\s*(=|!=|<>|<=|>=|<|>)\s*({_LIT})"
         rf"|({_LIT})\s*(=|!=|<>|<=|>=|<|>)\s*({_IDENT})"
         rf"|({_IDENT})\s+(?i:BETWEEN)\s+({_LIT})\s+(?i:AND)\s+({_LIT})"
         rf"|({_IDENT})\s+(?i:IN)\s*\(\s*({_LIT}(?:\s*,\s*{_LIT})*)\s*\)"
         rf"|({_IDENT})\s+(?i:IS)\s+((?i:NOT\s+)?)(?i:NULL))")
_COND_RE = re.compile(rf"\s*{_TERM}(?:\s+(?i:AND)\s+{_TERM})*\s*")
_TERM_RE = re.compile(_TERM)

_FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}


def _parse_lit(text: str):
    text = text.strip()
    if text.startswith("'"):
        return text[1:-1]
    v = float(text)
    return int(v) if v.is_integer() and "." not in text \
        and "e" not in text.lower() else v


def parse_prunable_condition(cond: str) -> list[tuple] | None:
    """``cond`` → list of terms, or None when the condition is outside
    the prunable grammar.  Terms: ``("cmp", col, op, lit)``,
    ``("between", col, lo, hi)``, ``("in", col, [lits])``,
    ``("null", col, is_null)``."""
    if _COND_RE.fullmatch(cond) is None:
        return None
    out: list[tuple] = []
    for m in _TERM_RE.finditer(cond):
        g = m.groups()
        if g[0] is not None:
            out.append(("cmp", g[0], "!=" if g[1] == "<>" else g[1],
                        _parse_lit(g[2])))
        elif g[3] is not None:
            op = "!=" if g[4] == "<>" else g[4]
            out.append(("cmp", g[5], _FLIP.get(op, op), _parse_lit(g[3])))
        elif g[6] is not None:
            out.append(("between", g[6], _parse_lit(g[7]), _parse_lit(g[8])))
        elif g[9] is not None:
            out.append(("in", g[9],
                        [_parse_lit(x) for x in
                         re.findall(_LIT, g[10])]))
        else:
            out.append(("null", g[11], not g[12].strip()))
    return out


def _comparable(a, b) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return True
    return isinstance(a, str) and isinstance(b, str)


_DATE_LIT_RE = re.compile(r"\d{4}-\d{2}-\d{2}")
# str(datetime) shape of pre-r9 manifests' timestamp stats
_LEGACY_TS_RE = re.compile(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d+)?")


def _date_safe(tkind, *lits) -> bool:
    """On a DATE-typed column, lexicographic pruning is only sound when
    EVERY literal is pure ``YYYY-MM-DD`` text (Spark casts the literal
    to date; other spellings — unpadded, with a time part — would
    compare as raw strings and mis-prune)."""
    if tkind != "date":
        return True
    return all(isinstance(v, str) and _DATE_LIT_RE.fullmatch(v)
               for v in lits)


def file_may_match(stats: dict, terms: list[tuple]) -> bool:
    """Can this file contain a row satisfying ALL ``terms``?  Errs on
    True: pruning (returning False) requires exact footer stats that
    PROVE no row matches."""
    for term in terms:
        col = term[1]
        s = stats.get(col)
        if s is None or not s.get("exact", False):
            continue                      # unknown column/stats → keep
        tkind = s.get("t")
        lo, hi = s.get("min"), s.get("max")
        nulls, rows = s.get("nulls", 0), s.get("rows", 0)
        all_null = rows > 0 and nulls == rows
        kind = term[0]
        if kind == "null":
            if term[2] and nulls == 0:
                return False              # needs NULLs, file has none
            if not term[2] and all_null:
                return False
            continue
        # value comparisons never match NULL rows
        if all_null or lo is None or hi is None:
            return False
        # legacy manifests (pre the temporal-stats fix) stored datetime
        # min/max as str(datetime) with exact=True and no tag — their
        # lexicographic compare against a cast literal is the exact
        # mis-prune the fix removed, so never prune on that shape
        if tkind is None and isinstance(lo, str) \
                and (_LEGACY_TS_RE.fullmatch(lo)
                     or (isinstance(hi, str)
                         and _LEGACY_TS_RE.fullmatch(hi))):
            continue
        if kind == "cmp":
            op, lit = term[2], term[3]
            if not _comparable(lo, lit) or not _date_safe(tkind, lit):
                continue
            if ((op == "=" and (lit < lo or lit > hi))
                    or (op == "<" and lo >= lit)
                    or (op == "<=" and lo > lit)
                    or (op == ">" and hi <= lit)
                    or (op == ">=" and hi < lit)
                    or (op == "!=" and lo == hi == lit and nulls == 0)):
                return False
        elif kind == "between":
            lo2, hi2 = term[2], term[3]
            if _comparable(lo, lo2) and _date_safe(tkind, lo2, hi2) \
                    and (hi < lo2 or lo > hi2):
                return False
        elif kind == "in":
            vals = [v for v in term[2] if _comparable(lo, v)]
            if len(vals) == len(term[2]) \
                    and _date_safe(tkind, *vals) \
                    and all(v < lo or v > hi for v in vals):
                return False
    return True


class SnapshotTable:
    """A versioned parquet table at ``path`` (local/posix scheme).

    Commits write DELTA manifests (r10): each doc stores only the
    files added/removed relative to its parent, so the commit write is
    O(changed files) — at 10⁶ table files an append no longer rewrites
    a ~140 MB file list per commit (the Iceberg manifest-delta shape).
    ``checkpoint_interval``: every N-th commit also publishes a
    checkpoint file (``_manifests/ckpt-v{N}.json``) carrying BOTH the
    accumulated per-producer txn high-water marks (so
    :meth:`append_once`'s idempotence walk stops there — the Delta
    ``_last_checkpoint`` pattern) AND a manifest-LIST of immutable
    content-addressed SEGMENT files holding the full resolved file
    list + stats (r11 — the compaction base that keeps delta-manifest
    resolution O(interval) and the only base past a vacuum horizon;
    only segments whose membership changed since the previous
    checkpoint are written, so the checkpoint write is O(changed
    segments), not O(table) — the Iceberg manifest-list shape).  Reads
    resolve head = nearest base + tail deltas, cached per instance."""

    checkpoint_interval: int = 100
    # target files per checkpoint SEGMENT (r11): checkpoints store a
    # manifest-LIST of immutable content-addressed segment files
    # instead of embedding the full file list, so the periodic
    # checkpoint write is O(changed segments), not O(table)
    checkpoint_segment_files: int = 512

    def __init__(self, spark: SparkSession, path: str,
                 checkpoint_interval: int | None = None) -> None:
        self.spark = spark
        self.path = path
        self._data = os.path.join(path, "data")
        self._manifests = os.path.join(path, "_manifests")
        if checkpoint_interval is not None:
            self.checkpoint_interval = int(checkpoint_interval)
        # resolved-manifest cache: manifests are immutable once linked
        # (create-exclusive publish), so entries never go stale; bounded
        # by periodic clear, repopulated by O(interval) walks
        self._mcache: dict[int, dict] = {}

    # -- bootstrap ---------------------------------------------------------

    @classmethod
    def create(cls, spark: SparkSession, path: str,
               schema: str | None = None,
               checkpoint_interval: int | None = None) -> "SnapshotTable":
        """``schema`` (optional DDL string, e.g. ``"id long, v double"``)
        types the empty v0 so readers before the first append see real
        columns."""
        t = cls(spark, path, checkpoint_interval=checkpoint_interval)
        os.makedirs(t._data, exist_ok=True)
        os.makedirs(t._manifests, exist_ok=True)
        if t.current_version() is None:
            schema_json = None
            if schema is not None:
                from pyspark.sql.types import StructType

                schema_json = StructType.fromDDL(schema).jsonValue()
            t._publish(0, files=[], operation="create", parent=None,
                       extra={"schema": schema_json})
        return t

    # -- manifest plumbing -------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifests, f"v{version:012d}.json")

    def current_version(self) -> int | None:
        try:
            names = [n for n in os.listdir(self._manifests)
                     if n.startswith("v") and n.endswith(".json")]
        except FileNotFoundError:
            return None
        if not names:
            return None
        return max(int(n[1:-5]) for n in names)

    def _load_raw(self, version: int) -> dict:
        """The manifest document exactly as stored — delta-mode docs
        (r10+) carry ``files_added`` / ``files_removed`` / ``stats_added``
        relative to their parent instead of the full file list."""
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def _seg_path(self, name: str) -> str:
        return os.path.join(self._manifests, name)

    def _ckpt_state(self, version: int) -> dict | None:
        """Full (files, file_stats) state reachable from the checkpoint
        at EXACTLY ``version``, or None.  Three generations coexist:
        r11+ checkpoints carry a ``segments`` manifest-list (resolved
        here by reading the immutable content-addressed segment files);
        r10 checkpoints embed ``files`` directly; pre-r10 checkpoints
        carried only txn marks — those return None and the resolve
        walk continues past them (their manifests were full-mode
        anyway).  A missing/corrupt segment also returns None: the
        checkpoint then behaves like a txn-only one, and vacuum's
        durability probe refuses to treat it as a horizon base."""
        try:
            with open(self._checkpoint_path(version)) as fh:
                doc = json.load(fh)
        except (OSError, ValueError):
            return None
        if "files" in doc:
            return doc
        if "segments" not in doc:
            return None
        files: list[str] = []
        stats: dict = {}
        try:
            for name in doc["segments"]:
                with open(self._seg_path(name)) as fh:
                    seg = json.load(fh)
                files.extend(seg["files"])
                stats.update(seg.get("file_stats") or {})
        except (OSError, ValueError, KeyError, TypeError):
            return None
        out = dict(doc)
        out["files"] = sorted(files)
        out["file_stats"] = stats
        return out

    def _write_segments(self, files: list[str],
                        stats: dict) -> list[str]:
        """Write the checkpoint's file state as content-addressed
        segment files and return their names.  Files hash-bucket by
        path into ``2^ceil(log2(n/segment_size))`` buckets (power-of-2
        growth: the bucketing only reshapes when the table doubles, an
        amortized-rare full rewrite); a bucket whose content is
        unchanged since the previous checkpoint hashes to the SAME
        name and is skipped — steady-state checkpoint IO is
        O(changed segments), not O(table)."""
        import hashlib
        import math as _math

        n = len(files)
        seg_size = max(1, int(self.checkpoint_segment_files))
        nb = 1 if n <= seg_size else 1 << _math.ceil(
            _math.log2(n / seg_size))
        buckets: list[list[str]] = [[] for _ in range(nb)]
        for f in files:
            b = int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % nb
            buckets[b].append(f)
        names: list[str] = []
        for b, fs in enumerate(buckets):
            fs.sort()
            doc = json.dumps(
                {"bucket": b, "n_buckets": nb, "files": fs,
                 "file_stats": {f: stats[f] for f in fs if f in stats}},
                sort_keys=True, separators=(",", ":"))
            h = hashlib.sha1(doc.encode()).hexdigest()[:20]
            name = f"seg-{h}.json"
            names.append(name)
            path = self._seg_path(name)
            if os.path.exists(path):
                # content-addressed: identical = reusable.  Refresh the
                # mtime so vacuum's min-age GC guard covers the REUSE
                # the same way it covers a fresh link — without it, a
                # bucket reverting to a state only referenced by an
                # already-vacuumed checkpoint could have its old-mtime
                # segment GC'd between this exists-check and the new
                # checkpoint doc becoming visible (r12 ADVICE fix).
                try:
                    os.utime(path)
                except OSError:
                    pass
                continue
            tmp = os.path.join(self._manifests,
                               f".tmp-{uuid.uuid4().hex}.json")
            with open(tmp, "w") as fh:
                fh.write(doc)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, path)
            except FileExistsError:
                pass            # concurrent writer landed the same content
            finally:
                os.unlink(tmp)
        return names

    def _load_manifest(self, version: int) -> dict:
        """Resolved manifest: ``files`` / ``file_stats`` materialized.

        Delta-mode manifests (the r10 commit format) are reconstructed
        by walking parent-ward to the nearest FULL base — a cached
        resolved ancestor, a checkpoint embedding the file list, or a
        full-mode (v0 / legacy) manifest — then folding the deltas
        forward.  The walk is O(checkpoint_interval) tiny JSON reads,
        never O(versions), and the vacuum horizon checkpoint guarantees
        a base always exists on the live side of a vacuum gap.
        """
        cached = self._mcache.get(version)
        if cached is not None:
            # a vacuumed version must fail like an expired snapshot
            # even when this instance resolved it before the vacuum
            if os.path.exists(self._manifest_path(version)):
                return cached
            self._mcache.pop(version, None)
            raise FileNotFoundError(self._manifest_path(version))
        doc = self._load_raw(version)
        if "files" in doc:
            full = doc                       # full-mode (v0 / legacy)
        else:
            chain = [doc]
            v = doc["parent"]
            base: dict | None = None
            while True:
                base = self._mcache.get(v)
                if base is not None:
                    break
                base = self._ckpt_state(v)
                if base is not None:
                    break
                d = self._load_raw(v)        # FileNotFoundError here
                if "files" in d:             # means a vacuum gap with
                    base = d                 # no horizon base: corrupt
                    break
                chain.append(d)
                v = d["parent"]
            files = set(base["files"])
            stats = dict(base.get("file_stats") or {})
            for d in reversed(chain):
                for f in d.get("files_removed") or ():
                    files.discard(f)
                    stats.pop(f, None)
                files.update(d.get("files_added") or ())
                stats.update(d.get("stats_added") or {})
            full = dict(doc)
            full["files"] = sorted(files)
            full["file_stats"] = {f: s for f, s in stats.items()
                                  if f in files}
        if len(self._mcache) > 64:
            self._mcache.clear()
        self._mcache[version] = full
        return full

    # -- txn checkpoints -----------------------------------------------------

    def _checkpoint_path(self, version: int) -> str:
        return os.path.join(self._manifests, f"ckpt-v{version:012d}.json")

    def _latest_checkpoint(self, head: int) -> dict | None:
        """Newest checkpoint at or below ``head`` (the ``_last_checkpoint``
        pointer is a HINT: validated against head and against the file
        actually existing, directory-scan fallback) — or None;
        checkpoints are pure optimization, every consumer must be
        correct without one."""
        try:
            with open(os.path.join(self._manifests,
                                   "_last_checkpoint.json")) as fh:
                v = int(json.load(fh)["version"])
            if v <= head:
                with open(self._checkpoint_path(v)) as fh:
                    return json.load(fh)
        except (OSError, ValueError, KeyError, TypeError):
            pass            # stale/absent/malformed pointer → scan
        try:
            vs = [int(n[6:-5]) for n in os.listdir(self._manifests)
                  if n.startswith("ckpt-v") and n.endswith(".json")]
        except FileNotFoundError:
            return None
        vs = [v for v in vs if v <= head]
        if not vs:
            return None
        try:
            with open(self._checkpoint_path(max(vs))) as fh:
                return json.load(fh)
        except (OSError, ValueError):       # gone or corrupt: no ckpt
            return None

    def _write_checkpoint(self, version: int) -> None:
        """Fold the txn high-water marks of every manifest since the
        previous checkpoint (plus that checkpoint's own map) into
        ``ckpt-v{version}.json``.  Create-exclusive like manifests —
        racing committers at the same version: first wins, rest no-op;
        the pointer update is atomic-replace (monotonicity is
        best-effort, staleness only costs a longer walk)."""
        prev = self._latest_checkpoint(version - 1)
        txn: dict[str, int] = dict(prev["txn"]) if prev else {}
        start = (prev["version"] + 1) if prev else 0
        for v in range(start, version + 1):
            try:
                meta = self._load_raw(v)
            except FileNotFoundError:
                continue                  # vacuumed: folded earlier
            t = meta.get("txn_id")
            if t is not None:
                tv = int(meta.get("txn_version", -1))
                if tv > txn.get(t, -1):
                    txn[t] = tv
        # reference the FULL resolved file state through a manifest-
        # LIST of immutable content-addressed segments (r11):
        # checkpoints are the walk bases that keep delta-manifest
        # resolution O(interval) and the only base past a vacuum
        # horizon, but only segments whose membership CHANGED since
        # the previous checkpoint are written — the last O(table)
        # write in the substrate is gone (SCALE §26)
        state = self._load_manifest(version)
        segs = self._write_segments(state["files"],
                                    state.get("file_stats") or {})
        doc = {"version": int(version), "txn": txn,
               "segments": segs, "n_files": len(state["files"]),
               "committed_at": time.time()}
        tmp = os.path.join(self._manifests,
                           f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(doc, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, self._checkpoint_path(version))
        except FileExistsError:
            # a pre-r10 checkpoint at this version carries txn marks
            # but NO file list — useless as a resolve base, which
            # vacuum REQUIRES at the horizon.  Upgrade it in place
            # (atomic replace; marks merged by max so legacy marks
            # from already-vacuumed manifests survive).
            try:
                with open(self._checkpoint_path(version)) as fh:
                    old = json.load(fh)
            except (OSError, ValueError):
                old = {}
            if "files" not in old and "segments" not in old:
                merged = dict(txn)
                for k, mv in (old.get("txn") or {}).items():
                    if int(mv) > merged.get(k, -1):
                        merged[k] = int(mv)
                doc["txn"] = merged
                up = os.path.join(self._manifests,
                                  f".tmp-{uuid.uuid4().hex}.json")
                with open(up, "w") as fh:
                    json.dump(doc, fh)
                    fh.flush()
                    os.fsync(fh.fileno())
                os.replace(up, self._checkpoint_path(version))
        finally:
            os.unlink(tmp)
        # pointer update is monotonic: vacuum's HORIZON checkpoint can
        # be older than a periodic checkpoint already pointed to —
        # rewinding the pointer would cost every subsequent walk
        # O(keep_last) manifests instead of O(interval) until the next
        # periodic write (perf only, but free to avoid).  The pointer
        # stays a hint either way (_latest_checkpoint validates it).
        ptr_path = os.path.join(self._manifests, "_last_checkpoint.json")
        try:
            with open(ptr_path) as fh:
                if int(json.load(fh)["version"]) > int(version):
                    return
        except (OSError, ValueError, KeyError, TypeError):
            pass              # absent/malformed pointer → write ours
        ptr_tmp = os.path.join(self._manifests,
                               f".tmp-{uuid.uuid4().hex}.json")
        with open(ptr_tmp, "w") as fh:
            json.dump({"version": int(version)}, fh)
        os.replace(ptr_tmp, ptr_path)

    def _publish(self, version: int, files: list[str] | None,
                 operation: str, parent: int | None,
                 extra: dict | None = None,
                 delta: tuple[list[str], list[str], int] | None = None
                 ) -> None:
        """Atomically publish one manifest.

        ``os.rename`` to an EXISTING path silently replaces it on POSIX,
        which would let two concurrent committers both "win" version N —
        so the temp manifest is first hard-linked into place via
        ``os.link`` (fails with EEXIST if the version was taken) and
        the temp unlinked after.  link+unlink is the portable atomic
        create-exclusive publish.

        Manifests with a parent are written in DELTA mode (r10): the
        doc stores ``files_added`` / ``files_removed`` / ``stats_added``
        relative to the parent's resolved file list, so the commit
        write is O(changed files), not O(table files) — the Iceberg
        manifest-delta posture.  A caller that already KNOWS its delta
        (appends: added = its new files, removed = none) passes
        ``delta=(added, removed, n_files)`` and the publish never
        touches the parent's file list at all; otherwise the delta is
        computed by diffing ``files`` against the parent's resolved
        view.  Periodic checkpoints (and the vacuum horizon fold)
        embed the full resolved list so reads stay
        O(checkpoint_interval).  Parentless manifests (v0) stay full.
        """
        extra = dict(extra or {})
        doc = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "committed_at": time.time(),
        }
        if parent is None:
            doc["files"] = sorted(files or [])
            doc["n_files"] = len(doc["files"])
        else:
            stats = extra.pop("file_stats", None) or {}
            if delta is not None:
                added, removed, n_files = delta
                added, removed = sorted(added), sorted(removed)
            else:
                cur = set(files)
                prev = set(self._load_manifest(parent)["files"])
                added = sorted(cur - prev)
                removed = sorted(prev - cur)
                n_files = len(cur)
            doc["n_files"] = int(n_files)
            doc["files_added"] = added
            doc["files_removed"] = removed
            doc["stats_added"] = {f: stats[f] for f in added
                                  if f in stats}
        doc.update(extra)
        tmp = os.path.join(self._manifests,
                           f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(doc, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, self._manifest_path(version))
        except FileExistsError as exc:
            raise CommitConflict(
                f"version {version} already committed") from exc
        finally:
            os.unlink(tmp)
        if (self.checkpoint_interval and self.checkpoint_interval > 0
                and version > 0
                and version % self.checkpoint_interval == 0):
            try:                 # an optimization — never fail a commit
                self._write_checkpoint(version)
            except Exception:    # incl. corrupt ckpt JSON, not just OS
                pass

    def _commit_append(self, new_files: list[str], schema_json,
                       stats: dict, retries: int = 10,
                       extra: dict | None = None,
                       precondition=None) -> int | None:
        """Optimistic APPEND commit: try head+1; on conflict re-read the
        head, RE-BASE onto its file list, and retry — safe because an
        append's own files are parent-independent.

        ``precondition(parent)`` (when given) is re-evaluated INSIDE
        every retry iteration, after the parent version is fixed: if it
        returns False the commit aborts and returns None.  Because the
        manifest publish is create-exclusive, any concurrent commit
        either landed at ≤ parent (visible to the check) or wins
        parent+1 and forces this committer back around the loop — the
        check-and-publish pair is effectively atomic.
        """
        for _ in range(retries):
            parent = self.current_version()
            version = 0 if parent is None else parent + 1
            if precondition is not None and not precondition(parent):
                self._discard_files(new_files)
                return None
            merged_schema = schema_json
            parent_dv: list[str] = []
            delta = None
            if parent is not None:
                # an append's delta IS its new files — the RAW parent
                # doc already carries everything else this commit needs
                # (schema, delete refs, running file count), so the
                # commit never materializes the parent's file list:
                # O(new files), whatever the table size
                pm = self._load_raw(parent)
                parent_dv = list(pm.get("delete_files") or [])
                n_files = int(pm.get("n_files",
                                     len(pm.get("files") or []))) \
                    + len(new_files)
                delta = (list(new_files), [], n_files)
                try:
                    merged_schema = _merge_schema_json(pm.get("schema"),
                                                       schema_json)
                except SchemaConflict:
                    self._discard_files(new_files)
                    raise
            try:
                # the parent's merge-on-read delete refs still govern
                # the parent's files, which ride along by reference
                self._publish(version, list(new_files), "append",
                              parent,
                              extra={"schema": merged_schema,
                                     "file_stats": dict(stats),
                                     **({"delete_files": parent_dv}
                                        if parent_dv else {}),
                                     **(extra or {})},
                              delta=delta)
                return version
            except CommitConflict:
                continue
        raise CommitConflict(
            f"lost the commit race {retries} times at {self.path}")

    def _commit_rewrite(self, operation: str, build,
                        keep_files=None, retries: int = 5,
                        precondition=None) -> int | None:
        """Optimistic REWRITE commit (merge / delete / overwrite /
        compact): materialize ``build(parent_version) -> DataFrame | None``
        against the CURRENT head and publish at head+1.  On conflict the
        stale output files are DISCARDED and the rewrite recomputed from
        the new head — never republished, which would silently drop the
        concurrent commit's rows (lost update).  ``keep_files(parent)``
        optionally returns parent files carried by REFERENCE (stats-
        pruned untouched files).

        ``precondition(parent)`` (optional) is re-evaluated inside
        every retry after the parent is fixed — returning False aborts
        the commit with ``None`` (nothing published).  This is the
        Iceberg validate-no-conflicting-commit hook: a caller whose
        REPLACEMENT ROWS were derived from an older snapshot (not just
        its file list — e.g. the IVF-PQ rebalance re-encode) passes
        ``lambda parent: parent == snapshot_it_read``, because the
        default rebase-and-retry would replace away rows a concurrent
        commit added under the same keys."""
        for _ in range(retries):
            parent = self.current_version()
            version = 0 if parent is None else parent + 1
            if precondition is not None and not precondition(parent):
                return None
            df = build(parent)
            kept: list[str] = [] if keep_files is None \
                else list(keep_files(parent))
            if df is None:
                new_files, schema_json, stats = [], None, {}
            else:
                new_files, schema_json, stats = self._write_data(df)
            if parent is not None:
                # additive evolution: the rewrite may add columns (an
                # evolved merge) or — when stats pruned every file — be
                # just the upsert side; parent-only columns must survive
                schema_json = _merge_schema_json(
                    self._load_manifest(parent).get("schema"), schema_json)
            file_stats = dict(stats)
            parent_dv: list[str] = []
            if kept and parent is not None:
                pm = self._load_manifest(parent)
                parent_stats = pm.get("file_stats", {})
                file_stats.update({f: parent_stats[f] for f in kept
                                   if f in parent_stats})
                # kept-by-reference files may still have merge-on-read
                # delete refs pointing at them; refs to the rewritten
                # files go stale (their paths leave the file list) and
                # anti-join nothing — harmless until compact drops them
                parent_dv = list(pm.get("delete_files") or [])
            try:
                self._publish(version, new_files + kept, operation,
                              parent, extra={"schema": schema_json,
                                             "file_stats": file_stats,
                                             **({"delete_files": parent_dv}
                                                if parent_dv else {})})
                return version
            except CommitConflict:
                self._discard_files(new_files)
                continue
        raise CommitConflict(
            f"lost the commit race {retries} times at {self.path}")

    def _read_files(self, manifest: dict, files: list[str],
                    with_pos: bool = False) -> DataFrame:
        """Scan ``files`` PINNED to the manifest's recorded schema: files
        that predate an added column read it as NULL, columns dropped
        from the schema are ignored even where a file still stores them
        (parquet name mapping) — every version reads with its own
        schema, uniformly across heterogeneous commits.

        Merge-on-read DELETES apply here: when the manifest carries
        ``delete_files`` (position-delete refs from
        ``delete_where(mode="mor")``), the scan anti-joins them on
        ``(_metadata.file_path, _metadata.row_index)`` — so every
        consumer (reads, rewrites, compaction) sees the post-delete
        rows without any caller-side handling.  ``with_pos=True`` keeps
        the ``__dv_file`` / ``__dv_pos`` columns (used when computing
        new delete refs)."""
        schema_json = manifest.get("schema")
        if schema_json:
            from pyspark.sql.types import StructType

            out = (self.spark.read
                   .schema(StructType.fromJson(schema_json))
                   .parquet(*files))
        else:
            out = self.spark.read.option("mergeSchema", "true") \
                      .parquet(*files)
        dv = manifest.get("delete_files") or []
        if dv or with_pos:
            from pyspark.sql import functions as F

            out = out.select(
                "*", F.col("_metadata.file_path").alias("__dv_file"),
                F.col("_metadata.row_index").alias("__dv_pos"))
            if dv:
                refs = self.spark.read.parquet(*dv)
                out = out.join(refs, ["__dv_file", "__dv_pos"],
                               "left_anti")
            if not with_pos:
                out = out.drop("__dv_file", "__dv_pos")
        return out

    def _discard_files(self, files: list[str]) -> None:
        """Remove a commit directory whose files never made it into any
        manifest (aborted commit)."""
        for d in {os.path.dirname(f) for f in files}:
            shutil.rmtree(d, ignore_errors=True)

    # -- writes ------------------------------------------------------------

    def _write_data(self, df: DataFrame):
        """Write ``df`` into a fresh commit dir; returns
        ``(files, schema_json, {file: column_stats})`` — stats read from
        each new file's parquet footer (driver-side, one footer per
        file)."""
        commit_dir = os.path.join(self._data, f"commit-{uuid.uuid4().hex}")
        df.write.parquet(commit_dir)
        files = [os.path.join(commit_dir, n)
                 for n in os.listdir(commit_dir)
                 if n.endswith(".parquet")]
        stats = {}
        for f in files:
            try:
                stats[f] = _file_column_stats(f)
            except Exception:
                stats[f] = {}            # footer unreadable → never prune
        return files, df.schema.jsonValue(), stats

    def append(self, df: DataFrame) -> int:
        """Add ``df``'s rows; parent files are REFERENCED, not rewritten
        (O(new data), the daily-ingest posture).  Returns the version."""
        files, schema_json, stats = self._write_data(df)
        return self._commit_append(files, schema_json, stats)

    def append_once(self, df: DataFrame, txn_id: str,
                    txn_version: int) -> int | None:
        """Transactional append for at-least-once producers (the Delta
        ``txn`` pattern): if this producer already committed
        ``txn_version' >= txn_version``, the append is a no-op (returns
        None) — a replayed micro-batch commits zero rows twice.

        The txn check runs INSIDE the optimistic-commit loop, re-checked
        against each candidate parent: the create-exclusive manifest
        publish means a concurrent same-txn commit either is already
        visible to the check or steals the version and forces a re-check
        — so two producers sharing a txn_id cannot double-commit.

        The check walks manifests NEWEST-first and stops at the first
        commit from this producer OR at the newest txn checkpoint
        (``checkpoint_interval``), whose folded high-water map answers
        for everything older — O(min(lag, interval)) manifest reads
        even for a producer the table has never seen, not O(table
        history).  Checkpoints also preserve txn marks past the vacuum
        horizon; still size ``vacuum(keep_last=)`` above the producer's
        replay window so the UNcheckpointed tail stays walkable."""
        if self._last_txn_version(txn_id) >= txn_version:
            return None                   # cheap pre-check: skip the write
        files, schema_json, stats = self._write_data(df)
        return self._commit_append(
            files, schema_json, stats,
            extra={"txn_id": txn_id, "txn_version": int(txn_version)},
            precondition=lambda parent:
                self._last_txn_version(txn_id, head=parent) < txn_version)

    def _last_txn_version(self, txn_id: str,
                          head: int | None = None) -> int:
        """Walk newest-first from ``head``; stop at the newest
        checkpoint ≤ head and answer from its folded txn map — so a
        producer the table has never seen costs O(checkpoint_interval)
        manifest reads, not O(versions)."""
        if head is None:
            head = self.current_version()
        if head is None:
            return -1
        ck = self._latest_checkpoint(head)
        floor = ck["version"] if ck else -1
        for v in range(head, floor, -1):
            try:
                meta = self._load_raw(v)
            except FileNotFoundError:
                # vacuum horizon inside the walk: everything older is
                # answered by the checkpoint's folded map (vacuum folds
                # one at the horizon before deleting), never by a blind
                # -1 — a -1 here would let append_once double-commit a
                # replayed batch whose mark sat below the gap
                break
            if meta.get("txn_id") == txn_id:
                return int(meta.get("txn_version", -1))
        return int(ck["txn"].get(txn_id, -1)) if ck else -1

    def merge(self, df: DataFrame, keys: list[str],
              precondition=None) -> int | None:
        """MERGE/upsert by key: rows of the current snapshot whose key
        appears in ``df`` are replaced, new keys are inserted —
        copy-on-write over the TOUCHED files only: manifest column stats
        prune files whose key range provably misses every ``df`` key
        (those are carried by reference, byte-identical), so the rewrite
        is O(files containing affected keys), not O(table).  On a commit
        conflict the merge recomputes from the new head.
        ``precondition(parent)`` (optional): abort with ``None`` when it
        returns False — for callers whose replacement ROWS derive from
        a pinned snapshot (see :meth:`_commit_rewrite`)."""
        df = df.localCheckpoint(eager=True)   # pin: evaluated per retry
        from pyspark.sql import functions as F

        bounds = {}
        key_vals: dict[str, list] = {}
        for k in keys:
            row = df.agg(F.min(k).alias("lo"), F.max(k).alias("hi")).first()
            bounds[k] = (row["lo"], row["hi"])
            # low-cardinality keys prune by VALUE SET, not range — an
            # upsert touching cells {0, 8} must not rewrite every file
            # whose range falls between them (the IVF-PQ rebalance
            # shape: one old partition + one brand-new max-id one)
            dv = df.select(k).distinct().limit(65).collect()
            if len(dv) <= 64:
                key_vals[k] = sorted(
                    (r[k] for r in dv if r[k] is not None))

        def touched_split(parent):
            if parent is None:
                return [], []
            m = self._load_manifest(parent)
            stats = m.get("file_stats", {})
            touched, kept = [], []
            for f in m["files"]:
                s = stats.get(f, {})
                overlap = True
                for k, (lo, hi) in bounds.items():
                    cs = s.get(k)
                    if not (cs and cs.get("exact")
                            and cs.get("min") is not None):
                        continue
                    vals = key_vals.get(k)
                    if vals is not None and all(
                            _comparable(cs["min"], v) for v in vals):
                        if all(v < cs["min"] or v > cs["max"]
                               for v in vals):
                            overlap = False
                            break
                    elif (lo is not None and _comparable(cs["min"], lo)
                            and (cs["max"] < lo or cs["min"] > hi)):
                        overlap = False
                        break
                (touched if overlap else kept).append(f)
            return touched, kept

        def build(parent):
            touched, _ = touched_split(parent)
            if not touched:
                return df
            current = self._read_files(self._load_manifest(parent),
                                       touched)
            remaining = current.join(df.select(*keys).distinct(), keys,
                                     "anti")
            # allowMissingColumns both ways: the upsert may carry NEW
            # columns (schema evolution) or omit existing ones (NULLs)
            return remaining.unionByName(df, allowMissingColumns=True)

        return self._commit_rewrite(
            "merge", build,
            keep_files=lambda parent: touched_split(parent)[1],
            precondition=precondition)

    def overwrite(self, df: DataFrame) -> int:
        """Replace the table contents (copy-on-write: old files stay on
        disk for older-version readers until ``vacuum``).  The file list
        does not derive from the parent snapshot, so a conflict retries
        the SAME files at the next version — last-writer-wins is the
        operation's semantics."""
        files, schema_json, stats = self._write_data(df)

        for _ in range(10):
            parent = self.current_version()
            version = 0 if parent is None else parent + 1
            try:
                self._publish(version, files, "overwrite", parent,
                              extra={"schema": schema_json,
                                     "file_stats": stats})
                return version
            except CommitConflict:
                continue
        raise CommitConflict(
            f"lost the commit race 10 times at {self.path}")

    def delete_where(self, condition: str, mode: str = "cow") -> int:
        """Delete rows matching ``condition``.

        ``mode="cow"`` (default): copy-on-write over the TOUCHED files
        only — manifest column stats prune files the predicate provably
        cannot match (simple AND-of-comparisons conditions; anything
        fancier rewrites everything — pruning is an optimization, never
        a semantics change).  Untouched files are carried by reference,
        byte-identical.  On a commit conflict the delete recomputes
        from the new head.

        ``mode="mor"`` (merge-on-read, the Iceberg v2 position-delete /
        Delta deletion-vector posture): NO data file is rewritten — the
        commit records ``(file, row_index)`` refs for the matching rows
        and every subsequent scan anti-joins them out.  Write cost is
        O(matching rows), not O(matching files), which is what a
        selective delete on a 100 TB table needs; the read-side
        anti-join is the usual MOR amplification, reclaimed by the next
        ``compact`` (which materializes the deletes and drops the
        refs)."""
        if mode == "mor":
            return self._delete_where_mor(condition)
        if mode != "cow":
            raise ValueError(f"unknown delete mode {mode!r}")
        terms = parse_prunable_condition(condition)

        def touched_split(parent):
            if parent is None:
                return [], []
            m = self._load_manifest(parent)
            files = m["files"]
            if terms is None:
                return files, []
            stats = m.get("file_stats", {})
            touched, kept = [], []
            for f in files:
                (touched if file_may_match(stats.get(f, {}), terms)
                 else kept).append(f)
            return touched, kept

        def build(parent):
            touched, _ = touched_split(parent)
            if not touched:
                return None
            # delete rows where the condition is TRUE; NULL (e.g. an
            # evolved column on pre-evolution rows) must KEEP the row —
            # a bare NOT(cond) would drop NULLs too
            return (self._read_files(self._load_manifest(parent), touched)
                    .filter(f"NOT coalesce(({condition}), false)"))

        return self._commit_rewrite(
            "delete", build,
            keep_files=lambda parent: touched_split(parent)[1])

    def _write_refs(self, refs: DataFrame) -> list[str]:
        """Write position-delete refs (``__dv_file``, ``__dv_pos``) into
        a fresh commit dir; same immutable-file discipline as data."""
        commit_dir = os.path.join(self._data,
                                  f"commit-{uuid.uuid4().hex}")
        refs.write.parquet(commit_dir)
        return [os.path.join(commit_dir, n)
                for n in os.listdir(commit_dir) if n.endswith(".parquet")]

    @staticmethod
    def _parquet_rows(path: str) -> int:
        import pyarrow.parquet as pq

        try:
            return pq.ParquetFile(path).metadata.num_rows
        except Exception:
            return 1        # unreadable footer: assume non-empty

    def _delete_where_mor(self, condition: str, retries: int = 5) -> int:
        """Merge-on-read delete (see :meth:`delete_where`): compute the
        matching rows' ``(file, row_index)`` refs against the current
        head (stats-pruned scan — only files that MAY match are opened)
        and publish a manifest with the SAME file list plus the new
        refs.  Rows already deleted never re-enter the refs
        (``_read_files`` anti-joins the existing refs during the
        computing scan).  On a commit conflict the refs are discarded
        and recomputed from the new head — a concurrent rewrite may
        have moved rows into new files, so stale refs must never be
        published.  No-op (returns the current version, no commit) when
        the predicate provably matches no file."""
        terms = parse_prunable_condition(condition)
        for _ in range(retries):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"no snapshot table at {self.path}")
            m = self._load_manifest(parent)
            files = m["files"]
            cand = files
            if terms is not None and files:
                stats = m.get("file_stats", {})
                cand = [f for f in files
                        if file_may_match(stats.get(f, {}), terms)]
            if not cand:
                return parent
            refs = (self._read_files(m, cand, with_pos=True)
                    .filter(f"coalesce(({condition}), false)")
                    .select("__dv_file", "__dv_pos"))
            new_refs = self._write_refs(refs)
            # exact no-op check from the refs footers (driver-side, KB):
            # zero matching rows -> no commit, nothing for readers to do
            if sum(self._parquet_rows(f) for f in new_refs) == 0:
                self._discard_files(new_refs)
                return parent
            try:
                self._publish(
                    parent + 1, files, "delete-mor", parent,
                    extra={"schema": m.get("schema"),
                           "file_stats": m.get("file_stats", {}),
                           "delete_files":
                               list(m.get("delete_files") or [])
                               + new_refs})
                return parent + 1
            except CommitConflict:
                self._discard_files(new_refs)
                continue
        raise CommitConflict(
            f"lost the commit race {retries} times at {self.path}")

    def compact(self, target_files: int = 8,
                cluster_by: list[str] | None = None) -> int:
        """Rewrite the current snapshot into ``target_files`` files as a
        new version — the small-files maintenance pass a streaming
        ``snapshot_sink`` table needs periodically (each micro-batch
        commit adds its own files; manifests and scan listings grow by
        file COUNT).  Old versions still time-travel until ``vacuum``;
        a commit conflict recompacts from the new head.

        ``cluster_by`` range-partitions and sorts the rewrite on those
        columns, so each output file covers a DISJOINT value range —
        which is what makes the manifest column stats actually prune:
        after a clustered compact, a keyed ``merge``/``delete_where``/
        ``read(where=)`` touches only the files whose range overlaps
        (the Delta OPTIMIZE ZORDER role, one dimension)."""

        def build(parent):
            if parent is None:
                return None
            manifest = self._load_manifest(parent)
            files = manifest["files"]
            if not files:
                return None
            df = self._read_files(manifest, files)
            if cluster_by:
                return (df.repartitionByRange(max(1, target_files),
                                              *cluster_by)
                          .sortWithinPartitions(*cluster_by))
            return df.coalesce(max(1, target_files))

        return self._commit_rewrite("compact", build)

    # -- schema evolution (metadata-only commits) --------------------------

    def _commit_evolve(self, evolve, retries: int = 10) -> int:
        """Publish a METADATA-ONLY commit: same files, evolved schema.
        ``evolve(schema_json) -> schema_json`` runs against the current
        head inside the optimistic retry loop — no data is read or
        written, the commit is O(manifest)."""
        for _ in range(retries):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"no snapshot table at {self.path}")
            pm = self._load_manifest(parent)
            try:
                pdv = list(pm.get("delete_files") or [])
                self._publish(parent + 1, pm["files"], "evolve-schema",
                              parent,
                              extra={"schema": evolve(pm.get("schema")),
                                     "file_stats": pm.get("file_stats",
                                                          {}),
                                     **({"delete_files": pdv}
                                        if pdv else {})})
                return parent + 1
            except CommitConflict:
                continue
        raise CommitConflict(
            f"lost the commit race {retries} times at {self.path}")

    def add_columns(self, ddl: str) -> int:
        """Add columns by DDL (``"tag string, score double"``) without
        touching any data file: existing files read the new columns as
        NULL (parquet name mapping).  Re-using a name that a PREVIOUS
        drop removed resurrects old values in pre-drop files — the
        field-ID gap vs real Iceberg; use a fresh name.  Raises
        :class:`SchemaConflict` if a column already exists."""
        from pyspark.sql.types import StructType

        new = StructType.fromDDL(ddl).jsonValue()

        def evolve(schema_json):
            if schema_json is None:
                return new
            have = {f["name"] for f in schema_json["fields"]}
            clash = have & {f["name"] for f in new["fields"]}
            if clash:
                raise SchemaConflict(
                    f"column(s) already exist: {sorted(clash)}")
            return _merge_schema_json(schema_json, new)

        return self._commit_evolve(evolve)

    def drop_columns(self, cols: list[str]) -> int:
        """Drop columns metadata-only: files keep the bytes (reclaimed
        only by a later ``compact``/rewrite), every read from this
        version on simply stops mapping them."""

        def evolve(schema_json):
            if schema_json is None:
                raise ValueError("table has no recorded schema to evolve")
            have = {f["name"] for f in schema_json["fields"]}
            missing = set(cols) - have
            if missing:
                raise ValueError(f"no such column(s): {sorted(missing)}")
            kept = [f for f in schema_json["fields"]
                    if f["name"] not in set(cols)]
            if not kept:
                raise ValueError("cannot drop every column")
            return {"type": "struct", "fields": kept}

        return self._commit_evolve(evolve)

    # -- reads -------------------------------------------------------------

    def row_count(self, version: int | None = None) -> int:
        """Row count from MANIFEST METADATA alone — zero data files
        opened (the Iceberg snapshot-summary read): every file's row
        count was recorded from its parquet footer at commit time.

        Falls back to ``read(version).count()`` when the metadata
        cannot answer exactly: a file committed with an unreadable
        footer (no stats), or merge-on-read delete refs in force
        (refs may be stale — pointing at files a later rewrite already
        replaced — so arithmetic on their count would overcount the
        deletions; ``compact`` materializes them away and restores the
        metadata path)."""
        if version is None:
            version = self.current_version()
        if version is None:
            raise ValueError(f"no snapshot table at {self.path}")
        m = self._load_manifest(version)
        if m.get("delete_files"):
            return int(self.read(version=version).count())
        stats = m.get("file_stats") or {}
        total = 0
        for f in m["files"]:
            per_col = stats.get(f) or {}
            rows = {c.get("rows") for c in per_col.values()
                    if isinstance(c, dict) and "rows" in c}
            if not rows:
                return int(self.read(version=version).count())
            total += max(rows)
        return int(total)

    def read(self, version: int | None = None,
             as_of: float | None = None,
             merge_schema: bool = False,
             where: str | None = None) -> DataFrame:
        """Snapshot read.  ``version`` pins an exact version; ``as_of``
        (unix seconds) picks the newest version committed at-or-before
        that time; default = current head.  Reads are PINNED to the
        version's recorded schema (see :meth:`_read_files`), so each
        version time-travels with the schema it had; ``merge_schema``
        only matters for pre-schema manifests (falls back to parquet
        ``mergeSchema``).
        ``where`` applies a filter AND file-prunes the scan via the
        manifest column stats (files the predicate provably cannot
        match are never opened)."""
        if version is None:
            version = self._resolve_as_of(as_of) if as_of is not None \
                else self.current_version()
        if version is None:
            raise ValueError(f"no snapshot table at {self.path}")
        manifest = self._load_manifest(version)
        files = manifest["files"]
        if where is not None and files:
            terms = parse_prunable_condition(where)
            if terms is not None:
                stats = manifest.get("file_stats", {})
                files = [f for f in files
                         if file_may_match(stats.get(f, {}), terms)]
        if not files:
            return self._empty_df(manifest)
        if manifest.get("schema") or merge_schema \
                or manifest.get("delete_files"):
            out = self._read_files(manifest, files)
        else:
            out = self.spark.read.parquet(*files)
        return out.filter(where) if where is not None else out

    def _empty_df(self, manifest: dict) -> DataFrame:
        """Typed empty DataFrame from the manifest's recorded schema —
        an empty snapshot must still select/filter on its columns."""
        schema_json = manifest.get("schema")
        if schema_json:
            from pyspark.sql.types import StructType

            return self.spark.createDataFrame(
                [], StructType.fromJson(schema_json))
        # pre-schema manifests (or create() without one): inherit the
        # nearest ancestor's schema if any version recorded one
        parent = manifest.get("parent")
        while parent is not None:
            try:
                pm = self._load_manifest(parent)
            except FileNotFoundError:
                break
            if pm.get("schema"):
                from pyspark.sql.types import StructType

                return self.spark.createDataFrame(
                    [], StructType.fromJson(pm["schema"]))
            parent = pm.get("parent")
        return self.spark.createDataFrame([], "__empty string") \
            .drop("__empty")

    def _resolve_as_of(self, ts: float) -> int:
        best = None
        for v, meta in self.history():
            if meta["committed_at"] <= ts and (best is None or v > best):
                best = v
        if best is None:
            raise ValueError(f"no version committed at or before {ts}")
        return best

    def history(self) -> list[tuple[int, dict]]:
        """(version, manifest) pairs, oldest first."""
        out = []
        for n in sorted(os.listdir(self._manifests)):
            if n.startswith("v") and n.endswith(".json"):
                v = int(n[1:-5])
                out.append((v, self._load_manifest(v)))
        return out

    def changes(self, from_version: int,
                to_version: int | None = None) -> DataFrame:
        """Incremental change feed between two versions (the Delta
        CDF / Iceberg incremental-read primitive): rows with a
        ``_change_type`` column (``insert`` / ``delete``) such that

            read(to) ≡ read(from) − deletes + inserts   (as multisets)

        so a downstream job consumes ONLY the delta — the x109
        incremental-dedup posture applied to the lake itself.

        Cost is O(CHANGED files), never O(table): only files in the
        symmetric manifest difference are scanned, plus surviving files
        whose merge-on-read delete-ref set changed between the versions
        (found from the ref parquet, which is small by construction).
        Rows a COW rewrite merely carried from an old file into a new
        one cancel in the multiset diff (``exceptAll`` both ways), so a
        ``compact`` — pure rewrite — yields an EMPTY feed, and a keyed
        ``merge`` yields exactly the touched keys' before/after rows.

        Output uses ``to_version``'s schema (what a CDC consumer
        materializes into): columns added between the versions read as
        NULL on the delete side, columns dropped are omitted."""
        from pyspark.sql import functions as F

        if to_version is None:
            to_version = self.current_version()
        if from_version > to_version:
            raise ValueError("from_version must be <= to_version")
        mf = self._load_manifest(from_version)
        mt = self._load_manifest(to_version)
        ff, ft = set(mf["files"]), set(mt["files"])
        side_from = sorted(ff - ft)
        side_to = sorted(ft - ff)
        # surviving files whose applicable position-delete refs changed
        dvf = set(mf.get("delete_files") or [])
        dvt = set(mt.get("delete_files") or [])
        common = ff & ft
        ref_delta = sorted((dvf ^ dvt))
        if ref_delta and common:
            # refs carry _metadata.file_path URIs ("file:///...");
            # manifests store plain paths — normalize before matching
            touched = {
                re.sub(r"^file:/+", "/", r["__dv_file"])
                for r in self.spark.read.parquet(*ref_delta)
                    .select("__dv_file").distinct().collect()}
            extra = sorted(touched & common)
            side_from += extra
            side_to += extra
        rows_to = (self._read_files(mt, side_to) if side_to
                   else self._empty_df(mt))
        rows_from = (self._read_files(mf, side_from) if side_from
                     else self._empty_df(mf))
        # align the from-side to the to-version's schema (types cannot
        # differ for a shared name — type changes raise SchemaConflict)
        have = set(rows_from.columns)
        rows_from = rows_from.select(*[
            F.col(f.name) if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in rows_to.schema.fields])
        ins = (rows_to.exceptAll(rows_from)
                      .withColumn("_change_type", F.lit("insert")))
        dels = (rows_from.exceptAll(rows_to)
                         .withColumn("_change_type", F.lit("delete")))
        return ins.unionByName(dels)

    # -- maintenance -------------------------------------------------------

    def vacuum(self, keep_last: int = 2,
               min_age_seconds: float = 3600.0) -> list[str]:
        """Drop manifests older than the newest ``keep_last`` versions
        and delete data files no retained manifest references.  Returns
        removed paths.  Readers pinned to a vacuumed version fail like
        any engine's expired snapshot — size ``keep_last`` to the
        longest query you run.

        Unreferenced commit dirs YOUNGER than ``min_age_seconds``
        (newest mtime anywhere in the tree, default 1 h) are kept: a
        concurrent writer that finished ``_write_data`` but has not yet
        published its manifest is referenced by nothing, and deleting
        its files would corrupt the head it is about to publish.  Pass
        ``0`` to force-clean when no writers can be active.

        If the pre-deletion horizon checkpoint (which folds the txn
        high-water marks of the manifests about to drop) cannot be
        durably written, the vacuum ABORTS with nothing deleted —
        deleting manifests without the fold would let ``append_once``
        double-commit a replayed producer batch across the gap.  The
        abort emits :class:`VacuumAbortedWarning` so maintenance jobs
        can tell "aborted" from "nothing to reclaim"."""
        versions = sorted(v for v, _ in self.history())
        keep = set(versions[-keep_last:]) if keep_last > 0 else set(versions)
        referenced: set[str] = set()
        for v in keep:
            meta = self._load_manifest(v)
            referenced.update(meta["files"])
            referenced.update(meta.get("delete_files") or [])
        removed: list[str] = []
        dropping = [v for v in versions if v not in keep]
        if dropping:
            # fold the txn high-water marks of every manifest about to
            # be deleted into a horizon checkpoint FIRST — otherwise a
            # producer whose last commit sits in the dropped range
            # could double-commit a replayed batch after the walk hits
            # the gap (checkpoints preserve marks past the horizon).
            # The fold is a PRECONDITION of deletion, not best-effort:
            # if the checkpoint cannot be durably written, keep every
            # manifest (skip the manifest phase entirely) rather than
            # open a vacuum gap with no folded marks behind it.
            horizon = max(dropping)
            try:
                self._write_checkpoint(horizon)
            except Exception:
                warnings.warn(
                    f"vacuum aborted: horizon checkpoint v{horizon} "
                    f"could not be written; nothing deleted",
                    VacuumAbortedWarning, stacklevel=2)
                return removed       # abort: nothing deleted
            # the horizon base must EMBED the file list (a pre-r10
            # txn-only checkpoint is not a resolve base — deleting
            # manifests behind it would brick the retained delta
            # chain); _write_checkpoint upgrades legacy docs in place,
            # so a miss here means the write was not durable
            if self._ckpt_state(horizon) is None:
                warnings.warn(
                    f"vacuum aborted: horizon checkpoint v{horizon} "
                    f"is not a durable file-bearing resolve base; "
                    f"nothing deleted", VacuumAbortedWarning,
                    stacklevel=2)
                return removed       # fold not durable: abort vacuum
        for v in dropping:
            os.unlink(self._manifest_path(v))
            removed.append(self._manifest_path(v))
        # superseded checkpoints: the newest folds all older txn maps,
        # but checkpoints at/above the vacuum horizon must survive —
        # they are the resolve BASES for the retained delta manifests
        # just above the gap (deleting the horizon checkpoint would
        # orphan every retained manifest whose delta chain crosses it)
        # floor = parent of the oldest retained manifest: a PREVIOUS
        # vacuum's horizon checkpoint sits there and may still be the
        # only base for the retained chain even when nothing drops now
        floor = (min(keep) - 1) if keep else 0
        cks = sorted(int(n[6:-5]) for n in os.listdir(self._manifests)
                     if n.startswith("ckpt-v") and n.endswith(".json"))
        for v in (c for c in cks[:-1] if c < floor):
            os.unlink(self._checkpoint_path(v))
            removed.append(self._checkpoint_path(v))
        now = time.time()
        # segment GC (r11): drop content-addressed checkpoint segments
        # no surviving checkpoint references — but never YOUNG ones (an
        # in-flight _write_checkpoint links its segments before its
        # checkpoint doc becomes visible, the same publish-order race
        # the data-dir min-age guard covers)
        live_segs: set[str] = set()
        segs_safe = True
        for n in os.listdir(self._manifests):
            if n.startswith("ckpt-v") and n.endswith(".json"):
                try:
                    with open(self._seg_path(n)) as fh:
                        live_segs.update(json.load(fh).get("segments")
                                         or ())
                except (OSError, ValueError):
                    # an unreadable checkpoint's references are
                    # unknown — deleting any segment could brick it,
                    # so skip segment GC entirely this round
                    segs_safe = False
        if segs_safe:
            for n in os.listdir(self._manifests):
                if (n.startswith("seg-") and n.endswith(".json")
                        and n not in live_segs):
                    p = self._seg_path(n)
                    try:
                        if now - os.path.getmtime(p) >= min_age_seconds:
                            os.unlink(p)
                            removed.append(p)
                    except OSError:
                        pass   # vanished underneath us

        def young(path: str) -> bool:
            try:
                newest = os.path.getmtime(path)
                for root, dirs, fs in os.walk(path):
                    for entry in dirs + fs:
                        newest = max(newest, os.path.getmtime(
                            os.path.join(root, entry)))
                return now - newest < min_age_seconds
            except OSError:
                return True     # vanished underneath us → a writer owns it

        # commit dirs whose every file is unreferenced can go wholesale —
        # unless young enough to belong to an in-flight commit
        for d in os.listdir(self._data):
            cdir = os.path.join(self._data, d)
            files = {os.path.join(cdir, n) for n in os.listdir(cdir)}
            if files and not (files & referenced) and not young(cdir):
                shutil.rmtree(cdir)
                removed.append(cdir)
        return removed


class ChangeFeedCursor:
    """Resumable consumption of a snapshot table's change feed — the
    client half of :meth:`SnapshotTable.changes`, with the offset
    persisted like a streaming checkpoint.

    ``poll()`` returns the feed from the last consumed version to the
    current head (or ``None`` when nothing new committed) and advances
    the cursor.  Delivery guarantee depends on when the offset commits:

    - ``autocommit=True`` (default): the new offset is persisted to
      ``checkpoint_path`` ATOMICALLY (write-temp + rename) **before**
      poll returns — offsets never duplicate a batch, but a consumer
      that crashes between ``poll()`` and finishing its processing
      permanently skips that batch.  This is **at-most-once** delivery
      (commit-before-process), suited to monitoring/metrics reads
      where a missed batch is acceptable.
    - ``autocommit=False`` + :meth:`commit` after processing:
      **at-least-once** delivery — a crash before ``commit()`` replays
      the same range on restart, so downstream processing must be
      idempotent (e.g. :meth:`SnapshotTable.append_once`).  This is
      the mode to use when every batch must be applied.

    The cursor stores only ``{"version": N}`` — restart-safe across
    processes, no Spark state.  Vacuum interplay: the feed needs BOTH
    endpoint manifests, so retention (``vacuum(keep_last=)``) must
    exceed the consumer's maximum lag, exactly like a streaming source
    reading a lake table.
    """

    def __init__(self, table: SnapshotTable, checkpoint_path: str,
                 start_version: int | None = None,
                 autocommit: bool = True) -> None:
        self.table = table
        self.checkpoint_path = checkpoint_path
        self.autocommit = autocommit
        self._pending: int | None = None
        if os.path.exists(checkpoint_path):
            with open(checkpoint_path) as fh:
                self._version = int(json.load(fh)["version"])
        else:
            head = table.current_version()
            self._version = (start_version if start_version is not None
                             else (head if head is not None else 0))
            self._persist(self._version)

    def _persist(self, version: int) -> None:
        tmp = f"{self.checkpoint_path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump({"version": int(version)}, fh)
        os.replace(tmp, self.checkpoint_path)

    @property
    def version(self) -> int:
        """Last committed offset (feed consumed up to this version)."""
        return self._version

    def poll(self) -> DataFrame | None:
        """Feed from the committed offset to the head, or None if the
        head hasn't moved.  With ``autocommit=True`` the offset is
        persisted BEFORE this returns (at-most-once — see class doc);
        with ``autocommit=False`` call :meth:`commit` after processing
        the returned batch (at-least-once)."""
        head = self.table.current_version()
        if head is None or head <= self._version:
            return None
        out = self.table.changes(self._version, head)
        if self.autocommit:
            self._persist(head)
            self._version = head
        else:
            self._pending = head
        return out

    def commit(self) -> None:
        """Commit the offset of the last un-committed poll()."""
        if self._pending is not None:
            self._persist(self._pending)
            self._version = self._pending
            self._pending = None

    def process(self, fn) -> bool:
        """At-least-once consumption as a first-class call: poll →
        ``fn(batch_df)`` → commit, regardless of the cursor's
        ``autocommit`` setting (the offset is committed ONLY after
        ``fn`` returns).  A crash inside ``fn`` leaves the offset
        untouched, so the next ``process()`` replays the same range —
        pair ``fn`` with idempotent sinks
        (:meth:`SnapshotTable.append_once`) for effective
        exactly-once.  Returns True when a batch was processed, False
        when the head hasn't moved."""
        head = self.table.current_version()
        if head is None or head <= self._version:
            return False
        fn(self.table.changes(self._version, head))
        self._persist(head)
        self._version = head
        self._pending = None
        return True
