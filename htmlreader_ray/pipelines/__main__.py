"""CLI for the resumable extraction driver:

    python -m htmlreader_ray.pipelines <input_dir_or_files...> <out_dir>
        [--shard-size N] [--mega-threshold BYTES] [--num-cpus N]

Re-runs resume from the manifest; completed shards are skipped.
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
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False, **kw)
    from .run import run_extract
    totals = run_extract(files, args.out_dir, shard_size=args.shard_size,
                         mega_threshold=args.mega_threshold)
    print(json.dumps(totals))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
