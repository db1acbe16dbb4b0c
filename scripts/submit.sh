#!/usr/bin/env bash
# Job-submission recipe for graft.Main — the spark-submit analogue of the
# reference's deployment spec (azure_data_factory/databricks_job.json):
#
#   databricks_job.json            this script
#   ---------------------------    ------------------------------------------
#   timeout_seconds: 3600          TIMEOUT_SECONDS=3600 (coreutils timeout;
#                                  exit 124 => job killed at the wall)
#   base_parameters:               $1 = sources_yaml, $2 = env
#     sources_yaml, env            (same defaults: metadata/sources.yaml, dev)
#   new_cluster: 1 worker          GRAFT_MASTER=local[4] GRAFT_DRIVER_MEM=4g
#     Standard_DS3_v2 (4 vCPU)     (override for a real cluster master URL)
#   spark_conf:
#     delta.schema.autoMerge       no conf needed: HubWriter widens/merges
#                                  schemas natively on every upsert
#   (no max_retries field          MAX_RETRIES=0 — one attempt, fail loudly;
#    => Databricks default 0)      set MAX_RETRIES>0 for an ADF-style retry
#
# Usage:
#   scripts/submit.sh [sources_yaml] [env]
#   scripts/submit.sh --smoke     # self-contained end-to-end demo: builds a
#                                 # catalog over the bundled sample files in a
#                                 # temp lake, runs it TWICE, and asserts
#                                 # RAW appends while HUB stays keyed
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_HOME="${SPARK_HOME:-/opt/spark}"
TIMEOUT_SECONDS="${TIMEOUT_SECONDS:-3600}"
MAX_RETRIES="${MAX_RETRIES:-0}"
GRAFT_MASTER="${GRAFT_MASTER:-local[4]}"
GRAFT_DRIVER_MEM="${GRAFT_DRIVER_MEM:-4g}"

JAR="$(ls target/scala-2.13/metadata_ingestion_pocspark_2.13-*[!s].jar 2>/dev/null | head -1 || true)"
if [ -z "$JAR" ] || [ -n "$(find src/main -name '*.scala' -newer "$JAR" 2>/dev/null | head -1)" ]; then
  echo "[submit] building application jar (sbt package)..."
  sbt -batch package >/dev/null
  JAR="$(ls target/scala-2.13/metadata_ingestion_pocspark_2.13-*[!s].jar | head -1)"
fi

SOURCES_YAML="${1:-metadata/sources.yaml}"
ENV_NAME="${2:-dev}"
SMOKE_LAKE=""
if [ "${1:-}" = "--smoke" ]; then
  SMOKE_LAKE="$(mktemp -d /tmp/graft_lake.XXXXXX)"
  SOURCES_YAML="$SMOKE_LAKE/sources.yaml"
  S="$(pwd)/src/test/resources/samples"
  cat > "$SOURCES_YAML" <<EOF
version: 1
defaults:
  raw_base: $SMOKE_LAKE/raw
  hub_base: $SMOKE_LAKE/hub
  checkpoint_base: $SMOKE_LAKE/_checkpoints
  domain: sales
sources:
  - id: customers_csv
    type: csv
    entity: customers
    options: {path: $S/customers.csv, header: true, inferSchema: true}
    hub_primary_keys: ["customer_id"]
  - id: orders_json
    type: json
    entity: orders
    options: {path: $S/orders.json, multiline: false}
    hub_primary_keys: ["order_id"]
  - id: cube_sales_olap
    type: olap
    entity: cube_sales
    options:
      xmla_endpoint: "powerbi://api.powerbi.com/v1.0/myorg/X"
      mdx: "SELECT ..."
      fallback_csv_path: $S/cube_sales_fallback.csv
    hub_primary_keys: ["category", "calendar_year"]
EOF
fi

run_once() {
  timeout "$TIMEOUT_SECONDS" "$SPARK_HOME/bin/spark-submit" \
    --master "$GRAFT_MASTER" \
    --driver-memory "$GRAFT_DRIVER_MEM" \
    --class graft.Main \
    "$JAR" \
    --sources_yaml "$SOURCES_YAML" --env "$ENV_NAME"
}

attempt=0
until run_once; do
  rc=$?
  if [ "$rc" -eq 124 ]; then
    echo "[submit] job exceeded timeout_seconds=$TIMEOUT_SECONDS — killed" >&2
  fi
  attempt=$((attempt + 1))
  if [ "$attempt" -gt "$MAX_RETRIES" ]; then
    echo "[submit] failed after $attempt attempt(s) (rc=$rc)" >&2
    exit "$rc"
  fi
  echo "[submit] retry $attempt/$MAX_RETRIES..." >&2
done

if [ -n "$SMOKE_LAKE" ]; then
  echo "[submit] smoke: second run (RAW must append, HUB must stay keyed)"
  run_once
  python3 - "$SMOKE_LAKE" <<'EOF'
import sys, glob
import duckdb
lake = sys.argv[1]
def raw(e):
    return duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{lake}/raw/{e}/*/*.parquet')"
    ).fetchone()[0]
# keyed hubs use the versioned layout: the latest manifest's audited row
# count is the snapshot size (a recursive read would double-count versions)
import json
def hub(e):
    logs = sorted(glob.glob(f"{lake}/hub/{e}/_log/*.json"))
    if not logs:  # flat keyless layout
        return duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{lake}/hub/{e}/*.parquet')"
        ).fetchone()[0]
    m = json.load(open(logs[-1]))
    return m["rows"]
expect_raw = {"customers": 6, "orders": 6, "cube_sales": 8}   # 2 runs appended
expect_hub = {"customers": 3, "orders": 3, "cube_sales": 4}   # keyed upsert
for e in expect_raw:
    r, h = raw(e), hub(e)
    ok = r == expect_raw[e] and h == expect_hub[e]
    print(f"[submit] {e}: raw={r} (want {expect_raw[e]}) hub={h} "
          f"(want {expect_hub[e]}) {'OK' if ok else 'MISMATCH'}")
    if not ok:
        sys.exit(1)
print("[submit] smoke PASSED")
EOF
fi
