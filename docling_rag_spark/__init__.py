"""PySpark-native main-content extraction + chunking engine.

A from-scratch rebuild of winrar23/docling-rag's parse-and-chunk capabilities
as batch DataFrame jobs over Common-Crawl-style page tables. See SURVEY.md.
"""

__version__ = "0.1.0"


def ship(spark) -> None:
    """Make this package importable on executors (spark-submit --py-files analog).

    Zips the package and registers it via ``SparkContext.addPyFile`` so that
    pandas-UDF workers can ``import docling_rag_spark`` regardless of how the
    driver process was launched. Idempotent per session.
    """
    import os
    import tempfile
    import zipfile

    sc = spark.sparkContext
    if getattr(sc, "_docling_rag_spark_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    fd, zpath = tempfile.mkstemp(suffix=".zip", prefix="docling_rag_spark_")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    sc._docling_rag_spark_shipped = True
