#!/bin/sh
# Build dist/geomesa-spark-ext.jar: the Catalyst extension rule
# (jvm/src/geomesaspark/ext/*.java) compiled against the pyspark
# distribution's own jars. Plain javac + jar — no Maven/Scala toolchain.
set -e
cd "$(dirname "$0")"
SPARK_JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
rm -rf build
mkdir -p build ../dist
javac -encoding UTF-8 -cp "$SPARK_JARS/*" -d build $(find src -name '*.java')
jar cf ../dist/geomesa-spark-ext.jar -C build .
echo "built ../dist/geomesa-spark-ext.jar"
