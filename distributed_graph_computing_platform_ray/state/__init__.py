from .manifest import GraphManifest  # noqa: F401
