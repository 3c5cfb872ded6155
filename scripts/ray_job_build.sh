#!/usr/bin/env bash
# Submit the flagship build to a Ray cluster (the north-rule run shape).
#
#   RAY_ADDRESS=http://<head>:8265 ./scripts/ray_job_build.sh \
#       s3://bucket/sf-tables s3://bucket/out-tiles
#
# The same command runs unchanged on the N-node and 4N-node clusters —
# parallelism comes from the cluster, not from flags (the CLI's --cpus is a
# local-mode sizing knob; under a job the entrypoint connects via
# RAY_ADDRESS and Ray Data sizes itself to the cluster).  Reruns resume:
# every tile bucket writes an atomic per-partition manifest, so a failed or
# preempted job skips finished buckets on the next submit.
set -euo pipefail
SF_DIR="${1:?sf dir (parquet tables)}"
OUT="${2:?output dir}"
shift 2 || true
exec ray job submit \
  --working-dir . \
  --runtime-env-json '{"py_modules": ["planetiler_ray"]}' \
  -- python -m planetiler_ray build --sf "$SF_DIR" --out "$OUT" \
     --format shard "$@"
