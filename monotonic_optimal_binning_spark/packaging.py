"""Build the ``--py-files`` artifact for cluster submission.

The jobs in :mod:`.jobs` are designed to run under

    spark-submit --py-files mob_spark.zip run_job.py <subcommand> ...

on a real cluster (YARN / k8s): the driver and every executor import the
package from the shipped zip, so nothing may rely on the repo checkout
being present on the cluster. :func:`build_pyfiles_zip` produces that
artifact reproducibly — source files only, stable ordering, pinned
timestamps — so two builds of the same tree are byte-identical (useful
for content-addressed artifact stores and cache keys).

``python -m monotonic_optimal_binning_spark.packaging [dest.zip]`` builds
it from the command line.
"""

from __future__ import annotations

import os
import zipfile

_PKG_NAME = "monotonic_optimal_binning_spark"
# pinned so rebuilding an unchanged tree yields a byte-identical artifact
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build_pyfiles_zip(dest_path: str, package_dir: str | None = None) -> str:
    """Zip the package for ``spark-submit --py-files``.

    Only ``.py`` sources are included (no ``__pycache__``, no editor
    droppings), archive names are rooted at the package name so the zip
    lands on ``sys.path`` ready to import, and entries are written in
    sorted order with a fixed timestamp for reproducibility.

    Returns ``dest_path``.
    """
    if package_dir is None:
        package_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(package_dir)

    members = []
    for dirpath, dirnames, filenames in os.walk(package_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                members.append((os.path.relpath(full, root), full))

    if not any(arc == f"{_PKG_NAME}/__init__.py" for arc, _ in members):
        raise ValueError(
            f"{package_dir} does not look like the {_PKG_NAME} package "
            "(no __init__.py found)"
        )

    with zipfile.ZipFile(dest_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(members):
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return dest_path


if __name__ == "__main__":
    import sys

    dest = sys.argv[1] if len(sys.argv) > 1 else "mob_spark.zip"
    print(build_pyfiles_zip(dest))
