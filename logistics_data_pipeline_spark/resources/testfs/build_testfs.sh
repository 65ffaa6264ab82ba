#!/usr/bin/env bash
# Reproducible build for testfs.jar (the local-master-only s3a:// stub
# filesystem used by the streaming object-store tests).
#
#   bash build_testfs.sh            # rebuild classes/ and testfs.jar in place
#
# Toolchain contract (what the committed binaries were built with):
#   - javac from OpenJDK 17 (any 17.x produces byte-identical class files
#     for these two sources; the verifying test compares class BYTES, not
#     the jar container, so jar timestamps don't matter)
#   - hadoop-client-api jar shipped inside the installed pyspark wheel
#     (resolved below; Hadoop 3.x FileSystem/AbstractFileSystem ABI)
#
# tests/test_s3a_path.py::test_testfs_jar_matches_source rebuilds
# via this same recipe and asserts the committed jar's class entries are
# byte-identical, so review never has to trust an unauditable binary.
set -euo pipefail
cd "$(dirname "$0")"

HADOOP_JAR=$(python - <<'PY'
import glob, os, pyspark
jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
print(sorted(glob.glob(os.path.join(jars, "hadoop-client-api-*.jar")))[0])
PY
)

rm -rf classes
mkdir -p classes
javac -encoding UTF-8 -classpath "$HADOOP_JAR" -d classes \
  S3AStubFileSystem.java S3AStubAbstractFs.java
# Normalize the jar for stable diffs: no manifest-version churn, sorted
# entries, epoch-independent by always passing the same file order.
jar cf testfs.jar -C classes logisticsfs
echo "built testfs.jar:"
unzip -l testfs.jar
