"""sous_chef_ray — a Ray-Data-native feature-materialization engine.

A from-scratch rebuild of the capabilities of baskaranz/sous-chef
(reference snapshot at /root/reference, studied in SURVEY.md):

* control plane: YAML feature-view/service/entity/source specs, config +
  metadata-tag validation, SQL column parsing / schema inference
  (reference: src/sous_chef/sous_chef.py, validators.py, sql_sources.py)
* data plane (the part the reference delegates to Feast / warehouses):
  point-in-time as-of joins, lag/lead windows, rolling aggregates,
  sessionization, backfill, dedup, grouped aggregation — implemented as
  idiomatic ray.data.Dataset pipelines over zero-copy Arrow batches.

Nothing is imported from feast; nothing is copied from the reference.
"""

__version__ = "0.1.0"

from sous_chef_ray.errors import SousChefError, ValidationError  # noqa: F401


def __getattr__(name):
    # lazy imports so `import sous_chef_ray` stays cheap (no ray import)
    if name in ("Engine", "SousChef", "FeatureView", "FeatureService", "Entity"):
        from sous_chef_ray import engine

        return getattr(engine, name if name != "SousChef" else "Engine")
    if name == "QUERIES":
        from sous_chef_ray.queries import QUERIES

        return QUERIES
    raise AttributeError(name)
