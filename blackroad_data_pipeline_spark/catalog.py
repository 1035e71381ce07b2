"""Pipeline metadata catalog (control plane).

Parity with the reference's SQLite catalog (reference main.py:21-79):
five tables — pipelines, sources, transforms, sinks, runs — JSON
configs in TEXT columns, WAL mode, ``PIPELINE_DB`` env override.

This is deliberately NOT a Spark concern: the catalog is driver-side
metadata measured in kilobytes; pipeline *data* never touches it. On
a cluster the same schema works over any shared SQLite/RDBMS path.
"""

from __future__ import annotations

import json
import os
import sqlite3
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
from pathlib import Path

DEFAULT_DB = Path.home() / ".blackroad_spark" / "pipelines.db"


def _db_path() -> Path:
    return Path(os.environ.get("PIPELINE_DB", str(DEFAULT_DB)))


_DDL = """
CREATE TABLE IF NOT EXISTS pipelines (
    id TEXT PRIMARY KEY, name TEXT NOT NULL, description TEXT,
    created_at TEXT, updated_at TEXT);
CREATE TABLE IF NOT EXISTS sources (
    id TEXT PRIMARY KEY, pipeline_id TEXT NOT NULL, name TEXT NOT NULL,
    source_type TEXT NOT NULL, config TEXT, schema TEXT, root INTEGER DEFAULT 1,
    created_at TEXT);
CREATE TABLE IF NOT EXISTS transforms (
    id TEXT PRIMARY KEY, pipeline_id TEXT NOT NULL,
    transform_type TEXT NOT NULL, config TEXT, order_index INTEGER,
    depends_on TEXT, created_at TEXT);
CREATE TABLE IF NOT EXISTS sinks (
    id TEXT PRIMARY KEY, pipeline_id TEXT NOT NULL,
    sink_type TEXT NOT NULL, config TEXT, created_at TEXT);
CREATE TABLE IF NOT EXISTS runs (
    id TEXT PRIMARY KEY, pipeline_id TEXT NOT NULL, status TEXT,
    started_at TEXT, finished_at TEXT, rows_read INTEGER,
    rows_written INTEGER, error TEXT, stats TEXT);
"""


def _now() -> str:
    return datetime.now(timezone.utc).isoformat()


def connect() -> sqlite3.Connection:
    path = _db_path()
    path.parent.mkdir(parents=True, exist_ok=True)
    con = sqlite3.connect(str(path))
    con.execute("PRAGMA journal_mode=WAL")
    con.executescript(_DDL)
    con.row_factory = sqlite3.Row
    return con


@dataclass
class Pipeline:
    id: str
    name: str
    description: str = ""
    created_at: str = field(default_factory=_now)


@dataclass
class SourceDef:
    id: str
    name: str
    source_type: str
    config: dict
    root: bool = True  # root sources feed the transform chain; non-root are join views


@dataclass
class TransformDef:
    id: str
    transform_type: str
    config: dict
    order_index: int
    depends_on: str | None = None


@dataclass
class SinkDef:
    id: str
    sink_type: str
    config: dict


class Catalog:
    """CRUD over the metadata tables. One instance per process."""

    def __init__(self) -> None:
        self.con = connect()

    # -- pipelines ---------------------------------------------------------

    def create_pipeline(self, name: str, description: str = "") -> Pipeline:
        p = Pipeline(id=str(uuid.uuid4()), name=name, description=description)
        self.con.execute(
            "INSERT INTO pipelines VALUES (?,?,?,?,?)",
            (p.id, p.name, p.description, p.created_at, p.created_at),
        )
        self.con.commit()
        return p

    def list_pipelines(self) -> list[dict]:
        rows = self.con.execute(
            "SELECT * FROM pipelines ORDER BY created_at DESC"
        ).fetchall()
        return [dict(r) for r in rows]

    # -- components --------------------------------------------------------

    def add_source(self, pipeline_id: str, name: str, source_type: str,
                   config: dict | None = None, root: bool = True) -> SourceDef:
        s = SourceDef(str(uuid.uuid4()), name, source_type, config or {}, root)
        self.con.execute(
            "INSERT INTO sources VALUES (?,?,?,?,?,?,?,?)",
            (s.id, pipeline_id, s.name, s.source_type, json.dumps(s.config),
             None, int(s.root), _now()),
        )
        self.con.commit()
        return s

    def add_transform(self, pipeline_id: str, transform_type: str,
                      config: dict | None = None, order_index: int = 0,
                      depends_on: str | None = None) -> TransformDef:
        t = TransformDef(str(uuid.uuid4()), transform_type, config or {},
                         order_index, depends_on)
        self.con.execute(
            "INSERT INTO transforms VALUES (?,?,?,?,?,?,?)",
            (t.id, pipeline_id, t.transform_type, json.dumps(t.config),
             t.order_index, depends_on, _now()),
        )
        self.con.commit()
        return t

    def add_sink(self, pipeline_id: str, sink_type: str,
                 config: dict | None = None) -> SinkDef:
        s = SinkDef(str(uuid.uuid4()), sink_type, config or {})
        self.con.execute(
            "INSERT INTO sinks VALUES (?,?,?,?,?)",
            (s.id, pipeline_id, s.sink_type, json.dumps(s.config), _now()),
        )
        self.con.commit()
        return s

    def components(self, pipeline_id: str) -> tuple[list[SourceDef], list[TransformDef], list[SinkDef]]:
        # rowid tiebreaks make ordering deterministic when two add_* calls
        # land in the same microsecond (created_at is ISO text) — root-union
        # column order must be stable across runs
        src = [
            SourceDef(r["id"], r["name"], r["source_type"],
                      json.loads(r["config"] or "{}"), bool(r["root"]))
            for r in self.con.execute(
                "SELECT * FROM sources WHERE pipeline_id=? ORDER BY created_at, rowid",
                (pipeline_id,)).fetchall()
        ]
        tr = [
            TransformDef(r["id"], r["transform_type"],
                         json.loads(r["config"] or "{}"), r["order_index"],
                         r["depends_on"])
            for r in self.con.execute(
                "SELECT * FROM transforms WHERE pipeline_id=? ORDER BY order_index, rowid",
                (pipeline_id,)).fetchall()
        ]
        snk = [
            SinkDef(r["id"], r["sink_type"], json.loads(r["config"] or "{}"))
            for r in self.con.execute(
                "SELECT * FROM sinks WHERE pipeline_id=? ORDER BY created_at, rowid",
                (pipeline_id,)).fetchall()
        ]
        return src, tr, snk

    def get_source(self, source_id: str) -> SourceDef | None:
        r = self.con.execute("SELECT * FROM sources WHERE id=?", (source_id,)).fetchone()
        if r is None:
            return None
        return SourceDef(r["id"], r["name"], r["source_type"],
                         json.loads(r["config"] or "{}"), bool(r["root"]))

    # -- runs ----------------------------------------------------------------

    def start_run(self, pipeline_id: str) -> str:
        run_id = str(uuid.uuid4())
        self.con.execute(
            "INSERT INTO runs VALUES (?,?,?,?,?,?,?,?,?)",
            (run_id, pipeline_id, "running", _now(), None, 0, 0, None, None),
        )
        self.con.commit()
        return run_id

    def finish_run(self, run_id: str, status: str, rows_read: int = 0,
                   rows_written: int = 0, error: str | None = None,
                   stats: dict | None = None) -> None:
        self.con.execute(
            "UPDATE runs SET status=?, finished_at=?, rows_read=?, "
            "rows_written=?, error=?, stats=? WHERE id=?",
            (status, _now(), rows_read, rows_written, error,
             json.dumps(stats or {}), run_id),
        )
        self.con.commit()

    def list_runs(self, pipeline_id: str | None = None) -> list[dict]:
        if pipeline_id:
            rows = self.con.execute(
                "SELECT * FROM runs WHERE pipeline_id=? ORDER BY started_at DESC",
                (pipeline_id,)).fetchall()
        else:
            rows = self.con.execute(
                "SELECT * FROM runs ORDER BY started_at DESC").fetchall()
        return [dict(r) for r in rows]
