"""Job entrypoint for ``ray job submit`` (north rule: the pipeline runs as
a submitted job on a fixed-size multi-node cluster):

    ray job submit --working-dir . -- \
        python -m schoolocr_ray --input /data/transcripts --output /data/out \
            --num-partitions 4096

On the cluster, ``ray.init(address="auto")`` attaches to the running
cluster; standalone (no cluster), it starts local mode.  The job is
resumable: re-submitting with the same input and code version skips
completed partitions via the lineage manifest.
"""
from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="schoolocr_ray",
                                description="Per-turn transcript content extraction job")
    p.add_argument("--input", required=True,
                   help="transcripts parquet directory or file")
    p.add_argument("--output", required=True, help="checkpointed output directory")
    p.add_argument("--num-partitions", type=int, default=64,
                   help="hash partitions = checkpoint/resume units")
    p.add_argument("--batch-size", type=int, default=None,
                   help="rows per actor call (default: whole blocks)")
    p.add_argument("--concurrency", type=int, default=None,
                   help="actor pool size (default: 3/4 of cluster CPUs)")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # ray.init() honors RAY_ADDRESS: under `ray job submit` it attaches
        # to the submitting cluster; standalone it starts local mode
        ray.init(ignore_reinit_error=True)
    import ray.data

    from .pipelines.job import run_job
    from .state.checkpoint import job_report

    manifest = run_job(args.input, args.output,
                       batch_size=args.batch_size,
                       concurrency=args.concurrency,
                       num_partitions=args.num_partitions)
    print(json.dumps(job_report(manifest)))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
