"""CLI — argparse parity with the reference (main.py:517-556):
create / list / run / runs / validate, plus ``explain`` (print the
optimized physical plan for a pipeline — the tool the reference
couldn't have).

Usage: python -m blackroad_data_pipeline_spark.cli <command> [...]
"""

from __future__ import annotations

import argparse
import json
import sys

from .service import PipelineService
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="blackroad-data-pipeline-spark")
    sub = parser.add_subparsers(dest="command", required=True)

    p_create = sub.add_parser("create", help="create a pipeline")
    p_create.add_argument("name")
    p_create.add_argument("--description", default="")

    sub.add_parser("list", help="list pipelines")

    p_run = sub.add_parser("run", help="run a pipeline")
    p_run.add_argument("pipeline_id")

    p_runs = sub.add_parser("runs", help="list runs")
    p_runs.add_argument("--pipeline-id", default=None)

    p_val = sub.add_parser("validate", help="validate a source's schema")
    p_val.add_argument("source_id")

    p_exp = sub.add_parser("explain", help="print a pipeline's physical plan")
    p_exp.add_argument("pipeline_id")

    args = parser.parse_args(argv)
    svc = PipelineService(get_spark("cli"))

    if args.command == "create":
        p = svc.create_pipeline(args.name, args.description)
        print(json.dumps({"id": p.id, "name": p.name}))
    elif args.command == "list":
        print(json.dumps(svc.list_pipelines(), indent=2, default=str))
    elif args.command == "run":
        result = svc.run_pipeline(args.pipeline_id)
        print(json.dumps(result))
        return 0 if result["status"] == "success" else 1
    elif args.command == "runs":
        print(json.dumps(svc.list_runs(args.pipeline_id), indent=2, default=str))
    elif args.command == "validate":
        print(json.dumps(svc.validate_schema(args.source_id)))
    elif args.command == "explain":
        df = svc.build_dataframe(args.pipeline_id)
        df.explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
