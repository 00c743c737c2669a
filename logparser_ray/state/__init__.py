"""Lineage manifests + checkpointed resume (BASELINE.json north_rule)."""

from logparser_ray.state.manifest import FragmentManifest, RoutedRunner  # noqa: F401
