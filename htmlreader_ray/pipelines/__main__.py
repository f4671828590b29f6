"""CLI for the resumable extraction driver — also the `ray job submit`
entrypoint for cluster runs:

    # single node / sandbox (RAY_ADDRESS=local starts an in-process cluster)
    python -m htmlreader_ray.pipelines <input_dir_or_files...> <out_dir>
        [--shard-size N] [--mega-threshold BYTES] [--num-cpus N]

    # fixed-size multi-node cluster (the job server sets RAY_ADDRESS to the
    # cluster GCS; ray.init() connects instead of starting a local instance)
    ray job submit --working-dir . -- \
        python -m htmlreader_ray.pipelines s3://bucket/corpus/ s3://bucket/out/

Re-runs resume from the manifest; completed shards are skipped. Do NOT pass
--num-cpus under `ray job submit` — the cluster's resources are authoritative.
"""

import argparse
import glob
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser(prog="htmlreader_ray.pipelines")
    ap.add_argument("inputs", nargs="+",
                    help="input parquet files or directories")
    ap.add_argument("out_dir")
    ap.add_argument("--shard-size", type=int, default=64)
    ap.add_argument("--mega-threshold", type=int, default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    files: list[str] = []
    for item in args.inputs:
        if os.path.isdir(item):
            files.extend(sorted(glob.glob(os.path.join(item, "*.parquet"))))
        else:
            files.append(item)
    if not files:
        print("no input parquet files found", file=sys.stderr)
        return 2

    import ray
    if not ray.is_initialized():
        # Respect RAY_ADDRESS: under `ray job submit` it points at the
        # cluster GCS and ray.init() connects to it; standalone (sandbox
        # presets RAY_ADDRESS=local) it starts an in-process instance.
        # Hardcoding address="local" here would silently start a second,
        # single-node Ray inside a cluster job.
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(include_dashboard=False, **kw)
    from .run import run_extract
    totals = run_extract(files, args.out_dir, shard_size=args.shard_size,
                         mega_threshold=args.mega_threshold)
    print(json.dumps(totals))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
