TRAINER_REGISTRY = {}


def register_trainer(name):
    def deco(cls):
        TRAINER_REGISTRY[name] = cls
        return cls

    return deco


def build_trainer(cfg, **kw):
    """Dispatch cfg.TRAINER like the reference's train_net.py:45-85."""
    _import_all()
    name = cfg.TRAINER or "base"
    if name not in TRAINER_REGISTRY:
        raise ValueError(f"unknown TRAINER {name!r}; have {sorted(TRAINER_REGISTRY)}")
    return TRAINER_REGISTRY[name](cfg, **kw)


def _import_all():
    import importlib

    for mod in ("base", "wq", "source_free_adaptive_teacher", "adaptive_teacher", "da"):
        try:
            importlib.import_module(f"{__name__}.{mod}")
        except ModuleNotFoundError as e:
            # only tolerate the trainer module itself being absent; a missing
            # DEPENDENCY (e.g. models.dann from da.py) must propagate, not
            # silently unregister the trainer
            if e.name != f"{__name__}.{mod}":
                raise
