"""Render the SLURM template and submit (ref ``SLURM/slurm-launch.py``).

    python slurm/launch.py --num-nodes 2 --command "python run.py --training-preset 2"
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--job-name", default=None)
    parser.add_argument("--num-nodes", type=int, default=1)
    parser.add_argument("--partition", default="batch")
    parser.add_argument("--time-limit", default="24:00:00")
    parser.add_argument("--command", required=True)
    parser.add_argument(
        "--dry-run", action="store_true", help="print the script, don't sbatch"
    )
    args = parser.parse_args()

    job_name = args.job_name or "nuzero-{}".format(time.strftime("%m%d-%H%M%S"))
    template_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "slurm-template.sh"
    )
    with open(template_path) as f:
        script = f.read()
    for key, value in {
        "JOB_NAME": job_name,
        "NUM_NODES": str(args.num_nodes),
        "PARTITION": args.partition,
        "TIME_LIMIT": args.time_limit,
        "COMMAND": args.command,
    }.items():
        script = script.replace("${%s}" % key, value)

    if args.dry_run:
        print(script)
        return

    with tempfile.NamedTemporaryFile(
        "w", suffix=".sh", delete=False
    ) as f:
        f.write(script)
        path = f.name
    try:
        subprocess.run(["sbatch", path], check=True)
    except FileNotFoundError:
        print("sbatch not found — not on a SLURM cluster?", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
