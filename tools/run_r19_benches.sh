#!/bin/bash
# r19 artifact-of-record bench sequence, run detached and SEQUENTIALLY
# (timed runs must not contend with each other). Every run goes through
# the r19 probe gate in STRICT mode (Bench refuses a window whose mem
# probe stays >1.3x the 0.21 s clean floor after the retry budget), so
# a degraded-window median can no longer become the round's record —
# the tooling form of the house "supersede, don't average" practice.
# Usage: tools/run_r19_benches.sh [sf10|full|sf1|sf100|all]
set -u
cd /root/repo
R=tools/run_bench_sf10.sh

gate_env() {
  export SPARK_GRAFT_CPUS=32
  export SPARK_GRAFT_GATE_STRICT=1
  export SPARK_GRAFT_GATE_RETRIES=${SPARK_GRAFT_GATE_RETRIES:-20}
  export SPARK_GRAFT_GATE_WAIT_SEC=${SPARK_GRAFT_GATE_WAIT_SEC:-60}
}

run_sf10() {
  gate_env
  SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_SF_DIR=/root/repo/tmp/sf10 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/tmp/BENCH_SF10_r19.json \
  $R graft.Bench > /root/repo/tmp/bench_sf10_r19.log 2>&1
  echo "sf10 exit $?"
}

run_full() {
  gate_env
  SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/tmp/BENCH_FULL_r19.json \
  $R graft.Bench > /root/repo/tmp/bench_full_r19.log 2>&1
  echo "full exit $?"
}

run_sf1() {
  gate_env
  SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SF_DIR=/root/repo/tmp/sf1 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/tmp/BENCH_SF1_r19.json \
  $R graft.Bench > /root/repo/tmp/bench_sf1_r19.log 2>&1
  echo "sf1 exit $?"
}

run_sf100() {
  # Decade-3 execution point (r18 verdict item 3): the cluster
  # families end-to-end on the 5M-doc documents-only directory, with
  # shuffle partitions raised past the local core count to exercise
  # the cluster-width salt spread the operators derive from it.
  gate_env
  SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_SF_DIR=/root/repo/tmp/sf100 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
  SPARK_GRAFT_BENCH_ONLY=q_dedup_clusters,q_dedup_incremental,q_simhash_clusters,q_simhash_incremental \
  SPARK_GRAFT_BENCH_OUT=/root/repo/tmp/BENCH_SF100_r19.json \
  $R graft.Bench > /root/repo/tmp/bench_sf100_r19.log 2>&1
  echo "sf100 exit $?"
}

case "${1:-all}" in
  sf10) run_sf10 ;;
  full) run_full ;;
  sf1) run_sf1 ;;
  sf100) run_sf100 ;;
  all) run_sf10; run_full; run_sf1; run_sf100 ;;
  *) echo "unknown target $1"; exit 2 ;;
esac
