"""The addPyFile package ship (session.ensure_package_on_executors):
Arrow UDF stages pickle by reference, so executor workers must be able to
import the package even when the driver was launched outside the repo."""

import os
import tempfile
import zipfile


def test_ship_builds_zip_and_is_idempotent(spark):
    from lakehouse_architecture_spark import session as S

    S.ensure_package_on_executors(spark)
    out = os.path.join(tempfile.gettempdir(), f"lhas_pkg_{os.getpid()}.zip")
    assert os.path.exists(out)
    with zipfile.ZipFile(out) as z:
        names = z.namelist()
    # the zip roots at the package dir so `import lakehouse_architecture_spark.x` works
    assert "lakehouse_architecture_spark/__init__.py" in names
    assert "lakehouse_architecture_spark/sources/manifest.py" in names
    assert all(n.endswith(".py") for n in names)
    app = spark.sparkContext.applicationId
    assert app in S._SHIPPED_APPS
    before = os.path.getmtime(out)
    S.ensure_package_on_executors(spark)  # no-op on the second call
    assert os.path.getmtime(out) == before


def test_shipped_zip_importable_by_workers(spark):
    """A mapInPandas stage that imports a package module must succeed —
    with the ship in place this holds regardless of driver cwd (the
    off-repo case is exercised by the driver-contract sim in /verify)."""
    import pandas as pd

    from lakehouse_architecture_spark.session import ensure_package_on_executors

    ensure_package_on_executors(spark)

    def probe(batches):
        import lakehouse_architecture_spark.sources.manifest as m

        for pdf in batches:
            yield pd.DataFrame({"ok": [hasattr(m, "bloom_admitted_files")] * len(pdf)})

    out = spark.range(4).mapInPandas(probe, "ok boolean").collect()
    assert all(r["ok"] for r in out)
