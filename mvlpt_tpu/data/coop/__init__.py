from mvlpt_tpu.data.coop import datasets  # noqa: F401  (registers loaders)
