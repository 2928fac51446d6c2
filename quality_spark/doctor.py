"""Store doctor — structured health checks for the persisted stores.

The three index stores (IVF-PQ `llm/pq.py`, BM25 `llm/retrieval.py`,
streaming near-dup `streaming/recipes.py`) each carry a crash-window
protocol (pending sentinels, epoch ledgers, append-only commit tables,
compaction staging dirs). Every state those protocols can leave behind
is DIAGNOSABLE from the store layout alone; this module turns that
into one operational surface:

    >>> from quality_spark.doctor import check_pq_store
    >>> rep = check_pq_store("s3a://bucket/pq_index")
    >>> rep["ok"], [f["code"] for f in rep["findings"]]

Each check returns ``{"ok": bool, "findings": [{"level", "code",
"detail"}...]}`` — ``ok`` is False iff any ERROR-level finding exists.
Levels: ``error`` (readers refuse / data at risk — act), ``warn``
(junk that costs nothing yet: orphaned staging dirs, stale markers),
``info`` (observations).

All I/O goes through `sources.fsio` (any Hadoop filesystem) and reads
only sidecars and directory listings — never data files, so a check
on a 100 TB store is metadata-priced.
"""

from __future__ import annotations

from typing import Dict, List

from .sources import fsio


def _finding(findings: List[dict], level: str, code: str, detail: str):
    findings.append({"level": level, "code": code, "detail": detail})


def _report(findings: List[dict]) -> Dict:
    return {
        "ok": not any(f["level"] == "error" for f in findings),
        "findings": findings,
    }


def _check_ledger(path: str, findings: List[dict]) -> None:
    ledger = fsio.join(path, "epochs.json")
    if not fsio.exists(ledger):
        return
    try:
        led = fsio.read_json(ledger)
        applied = led["applied"]
        if not isinstance(applied, list) or any(
            not isinstance(e, int) for e in applied
        ):
            raise TypeError(f"applied is {applied!r}, not a list of ints")
        disordered = applied != sorted(set(applied))
    except Exception as ex:  # noqa: BLE001 — diagnosis, not control flow
        _finding(
            findings, "error", "ledger_unreadable",
            f"epochs.json exists but cannot be parsed ({ex}) — "
            "exactly-once replay decisions are impossible; restore "
            "the previous snapshot or rebuild",
        )
        return
    if disordered:
        _finding(
            findings, "error", "ledger_disorder",
            f"epochs.json applied list {applied!r} is not "
            "sorted-unique — the ledger was hand-edited or torn",
        )


def _check_index_store(path: str, kind: str, tables: tuple) -> Dict:
    """Shared checks for the PQ / BM25 stores (same sidecar protocol)."""
    findings: List[dict] = []
    pending = fsio.join(path, "meta.json.pending")
    meta = fsio.join(path, "meta.json")
    if fsio.exists(pending):
        try:
            op = fsio.read_json(pending).get("op", "?")
        except Exception:  # noqa: BLE001
            op = "?"
        _finding(
            findings, "error", "pending_sentinel",
            f"meta.json.pending present (interrupted {op!r}) — every "
            "reader refuses this store; restore the previous snapshot "
            f"or rebuild with write_{kind}_index",
        )
    if not fsio.exists(meta):
        if not fsio.exists(pending):
            _finding(
                findings, "error", "no_meta",
                "meta.json missing and no pending sentinel — not a "
                f"{kind} store (or its commit was lost)",
            )
    else:
        try:
            fsio.read_json(meta)
        except Exception as ex:  # noqa: BLE001
            _finding(
                findings, "error", "meta_unreadable",
                f"meta.json cannot be parsed ({ex})",
            )
    _check_ledger(path, findings)
    for table in tables:
        tdir = fsio.join(path, table)
        if fsio.exists(meta) and not fsio.exists(tdir):
            _finding(
                findings, "error", "missing_table",
                f"{table}/ directory missing beside a committed "
                "meta.json — data was deleted out-of-band",
            )
        for suffix in (".compact", ".old"):
            leftover = tdir + suffix
            if fsio.exists(leftover):
                _finding(
                    findings, "warn", "orphan_compaction_dir",
                    f"{table}{suffix}/ present — a compaction crashed "
                    "after staging; harmless to readers (the sentinel "
                    "protocol decides liveness) and swept by the next "
                    "rebuild, but it is paying storage",
                )
    return _report(findings)


def check_pq_store(path: str) -> Dict:
    """Health-check a `write_pq_index` store (metadata-only)."""
    return _check_index_store(path, "pq", ("codes",))


def check_bm25_store(path: str) -> Dict:
    """Health-check a `write_bm25_index` store (metadata-only)."""
    return _check_index_store(path, "bm25", ("postings", "tokens"))


def check_neardup_store(spark, path: str) -> Dict:
    """Health-check a `neardup_to_store` store: committed version
    chain, compaction sentinel/generations, in-flight markers, and
    orphaned epoch dirs. Reads the commit tables (tiny parquet) plus
    directory listings — never idmap/sigs data."""
    from .streaming.recipes import (
        _neardup_committed,
        _neardup_compaction_gens,
        _neardup_live_dirs,
    )

    findings: List[dict] = []
    if fsio.exists(fsio.join(path, "compactions", "_COMPACTING")):
        _finding(
            findings, "error", "compacting_sentinel",
            "compactions/_COMPACTING present — a compaction is "
            "running (do nothing) or crashed (batches are blocked; "
            "delete the sentinel file and re-run the compaction)",
        )
    try:
        eps, ver = _neardup_committed(spark, path)
    except Exception as ex:  # noqa: BLE001
        _finding(
            findings, "error", "commit_chain_unreadable",
            f"the committed alias-version chain cannot be read ({ex})",
        )
        return _report(findings)
    if not eps:
        _finding(
            findings, "info", "empty_store",
            "no committed epochs — new or never-written store",
        )
        return _report(findings)
    live = set(_neardup_live_dirs(spark, path, eps))
    # stale / in-flight markers
    for name in fsio.list_names(fsio.join(path, "_inflight")):
        if not name.startswith("epoch="):
            continue
        try:
            ep = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if ep in eps:
            _finding(
                findings, "warn", "stale_inflight_marker",
                f"_inflight/{name} names a COMMITTED epoch — a batch "
                "crashed between commit and marker delete; the next "
                "replay of that epoch clears it, or delete the marker",
            )
        else:
            _finding(
                findings, "info", "inflight_marker",
                f"_inflight/{name}: a batch is in flight, or crashed "
                "pre-commit (clears when the epoch replays; "
                "compact_neardup_store(force=True) if the checkpoint "
                "was abandoned)",
            )
    # orphaned physical epoch dirs (crashed batches / compactions)
    for table in ("idmap", "sigs"):
        for name in fsio.list_names(fsio.join(path, table)):
            if not name.startswith("epoch="):
                continue
            try:
                d = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if d not in live:
                _finding(
                    findings, "warn", "orphan_epoch_dir",
                    f"{table}/{name} is referenced by no committed "
                    "state (crashed batch or superseded compaction) — "
                    "invisible to readers, swept by the next "
                    "compaction",
                )
    # committed epochs whose physical dirs vanished = data loss
    gens = _neardup_compaction_gens(spark, path)
    for table in ("idmap", "sigs"):
        names = set(fsio.list_names(fsio.join(path, table)))
        for d in live:
            if f"epoch={d}" not in names:
                _finding(
                    findings, "error", "missing_live_dir",
                    f"{table}/epoch={d} is in the committed live set "
                    "but the directory is gone — history rows were "
                    "lost out-of-band; matches against that history "
                    "will silently miss",
                )
    _finding(
        findings, "info", "summary",
        f"{len(eps)} committed epochs, newest alias version {ver}, "
        f"{len(live)} live dirs, {len(gens)} committed compactions",
    )
    return _report(findings)
