#!/usr/bin/env bash
# Online validation for CassandraArchiveSource (README §"Online validation").
#
# The sandbox build is zero-egress: the connector jar cannot resolve and
# no cluster exists, so `CassandraArchiveSource.load()` never executes
# there — the offline fence test (ArchiveSourceSpec) pins the wire
# contract only. This script is the CI-side complement: run it on a host
# with network access + docker and it buys the missing runtime evidence:
#
#   1. resolves the spark-cassandra-connector jar from Maven Central
#      (coursier if present, plain curl otherwise);
#   2. boots a dockerized Cassandra and loads the HDB++-shaped schema
#      the reference queries (hdbpp.py:95-208): att_conf plus an
#      att_scalar_devdouble_ro table partition-keyed on
#      ((att_conf_id, period)), seeded with a few partitions;
#   3. re-runs the fence spec WITH the jar on the test classpath — its
#      reflection probe then additionally asserts that the pinned
#      format string resolves to the connector — and runs the
#      env-gated CassandraLiveSpec: a live `load()`, a `points()` scan
#      returning the seeded rows, and an EXPLAIN asserting both
#      partition-key `IN` filters reach the connector's pushed-filter
#      list (a `period` range would silently unpush; see the
#      CassandraArchiveSource scaladoc).
#
# Environment overrides:
#   CONNECTOR_COORD   maven coordinate of the connector assembly
#                     (default 3.5.1; pick the line matching the
#                     cluster's Spark major version)
#   CASSANDRA_IMAGE   docker image to boot (default cassandra:4.1)
#   KEEP_CASSANDRA=1  leave the container running for inspection
set -euo pipefail
cd "$(dirname "$0")/.."

CONNECTOR_COORD=${CONNECTOR_COORD:-com.datastax.spark:spark-cassandra-connector-assembly_2.13:3.5.1}
CASSANDRA_IMAGE=${CASSANDRA_IMAGE:-cassandra:4.1}
CONTAINER=graft-cassandra-check

# ---- 1. connector jar(s) ----------------------------------------------
# cs fetch prints ONE PATH PER LINE (the artifact plus any transitive
# deps its pom declares) — collect them all; treating that output as a
# single path would add a bogus colon-joined file and the live spec
# would silently skip on its connector-present assume.
if command -v cs >/dev/null 2>&1; then
  mapfile -t JARS < <(cs fetch "$CONNECTOR_COORD")
else
  IFS=: read -r GROUP ARTIFACT VERSION <<<"$CONNECTOR_COORD"
  JAR="/tmp/${ARTIFACT}-${VERSION}.jar"
  URL="https://repo1.maven.org/maven2/${GROUP//.//}/${ARTIFACT}/${VERSION}/${ARTIFACT}-${VERSION}.jar"
  [ -s "$JAR" ] || curl -fSL -o "$JAR" "$URL"
  JARS=("$JAR")
fi
[ "${#JARS[@]}" -gt 0 ] || { echo "no connector jars resolved" >&2; exit 1; }
SBT_SETS=()
for j in "${JARS[@]}"; do
  SBT_SETS+=("set Test/unmanagedJars += file(\"$j\")")
done
echo "[online_check] connector jars: ${JARS[*]}"

# ---- 2. dockerized cassandra + HDB++ schema ---------------------------
docker rm -f "$CONTAINER" >/dev/null 2>&1 || true
docker run -d --name "$CONTAINER" -p 9042:9042 "$CASSANDRA_IMAGE" >/dev/null
if [ "${KEEP_CASSANDRA:-0}" != 1 ]; then
  trap 'docker rm -f "$CONTAINER" >/dev/null 2>&1 || true' EXIT
fi
echo "[online_check] waiting for cassandra to accept CQL…"
for i in $(seq 1 60); do
  if docker exec "$CONTAINER" cqlsh -e "DESCRIBE KEYSPACES" \
      >/dev/null 2>&1; then
    break
  fi
  [ "$i" = 60 ] && { echo "cassandra never came up" >&2; exit 1; }
  sleep 5
done

docker exec -i "$CONTAINER" cqlsh <<'CQL'
CREATE KEYSPACE IF NOT EXISTS hdbpp
  WITH replication = {'class': 'SimpleStrategy', 'replication_factor': 1};
CREATE TABLE IF NOT EXISTS hdbpp.att_conf (
  att_conf_id int PRIMARY KEY, att_name text, data_type text);
-- partition key ((att_conf_id, period)): the layout the reference's
-- per-day CQL fan-out depends on (hdbpp.py:274-321) and the reason
-- pointsPredicate enumerates periods as an IN list
CREATE TABLE IF NOT EXISTS hdbpp.att_scalar_devdouble_ro (
  att_conf_id int, period text,
  data_time timestamp, data_time_us int,
  value_r double, error_desc text,
  PRIMARY KEY ((att_conf_id, period), data_time, data_time_us));
INSERT INTO hdbpp.att_conf (att_conf_id, att_name, data_type)
  VALUES (1, 'tango://cs/r3/vac/p1/pressure', 'scalar_devdouble_ro');
INSERT INTO hdbpp.att_conf (att_conf_id, att_name, data_type)
  VALUES (2, 'tango://cs/r3/mag/d1/current', 'scalar_devdouble_ro');
INSERT INTO hdbpp.att_scalar_devdouble_ro
  (att_conf_id, period, data_time, data_time_us, value_r)
  VALUES (1, '2024-01-01', '2024-01-01 00:00:10+0000', 0, 1.5);
INSERT INTO hdbpp.att_scalar_devdouble_ro
  (att_conf_id, period, data_time, data_time_us, value_r)
  VALUES (1, '2024-01-02', '2024-01-02 00:00:20+0000', 0, 2.5);
INSERT INTO hdbpp.att_scalar_devdouble_ro
  (att_conf_id, period, data_time, data_time_us, value_r)
  VALUES (1, '2024-01-03', '2024-01-03 00:00:30+0000', 0, 3.5);
INSERT INTO hdbpp.att_scalar_devdouble_ro
  (att_conf_id, period, data_time, data_time_us, value_r)
  VALUES (2, '2024-01-01', '2024-01-01 12:00:00+0000', 0, 9.0);
CQL
echo "[online_check] schema + seed rows loaded"

# ---- 3. fence + live specs with the jar on the classpath --------------
GRAFT_CASSANDRA_HOST=127.0.0.1 sbt -batch \
  "${SBT_SETS[@]}" \
  "testOnly graft.sources.ArchiveSourceSpec graft.sources.CassandraLiveSpec"
echo "[online_check] OK — connector resolved, live scan + pushdown verified"
