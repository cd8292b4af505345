"""Standalone flagship runner for the kill-and-resume test.

Owns its own Ray session (library code never calls ray.init); prints one
JSON line with the per-stage metrics so the parent test can tell which
stages were skipped on resume. Invoked as:

    python tests/flagship_runner.py <input_dir> <out_root> <num_cpus>
"""

import json
import sys


def main() -> None:
    input_dir, out_root, num_cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    from signalsharp_ray.pipelines.flagship import FlagshipConfig, run_flagship

    res = run_flagship(
        lambda: rd.read_parquet(input_dir),
        f"killtest:{input_dir}",
        FlagshipConfig(out_root=out_root),
    )
    print("RESULT " + json.dumps({k: round(v, 3) for k, v in res["metrics"].items()}))
    ray.shutdown()


if __name__ == "__main__":
    main()
