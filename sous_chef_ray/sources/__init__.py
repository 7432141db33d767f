from sous_chef_ray.sources.registry import SourceRegistry  # noqa: F401
