import sys

# --cpu must take effect BEFORE the package import below: importing
# mitsuba2_tpu materializes device arrays (CIE tables), which locks the
# JAX backend — config updates after that are ignored.
if "--cpu" in sys.argv[1:]:
    import jax
    jax.config.update("jax_platforms", "cpu")

from .cli import main  # noqa: E402

sys.exit(main())
