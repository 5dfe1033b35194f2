"""CLI entrypoints (train / eval / predict / preprocess / extract).

Platform guard: the axon TPU plugin's ``sitecustomize`` forces
``jax_platforms="axon,cpu"`` *programmatically*, which silently overrides
the standard ``JAX_PLATFORMS`` environment variable — a
``JAX_PLATFORMS=cpu`` CLI run would still probe the TPU relay (and hang
for minutes when the relay is down). Restore the documented env-var
semantics for every CLI entrypoint before any backend initializes.
"""

import os as _os

_plat = _os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)
