"""String-typed component registries.

The reference resolves every component from config dicts with a ``type`` key
against named registries (reference: ``mmdet/models/builder.py:4-67``,
``mmdet/datasets/builder.py:22-23``).  This is the framework's public
extension API, so we keep it intact.
"""

from __future__ import annotations

import inspect


class Registry:
    def __init__(self, name):
        self._name = name
        self._module_dict = {}

    @property
    def name(self):
        return self._name

    @property
    def module_dict(self):
        return self._module_dict

    def __len__(self):
        return len(self._module_dict)

    def __contains__(self, key):
        return key in self._module_dict

    def __repr__(self):
        return (f"Registry(name={self._name}, "
                f"items={list(self._module_dict)})")

    def get(self, key):
        return self._module_dict.get(key)

    def _register(self, cls, name=None, force=False):
        if not (inspect.isclass(cls) or inspect.isfunction(cls)):
            raise TypeError(f"module must be a class or function, got {type(cls)}")
        names = [cls.__name__] if name is None else (
            [name] if isinstance(name, str) else list(name))
        for n in names:
            if not force and n in self._module_dict:
                raise KeyError(f"{n} is already registered in {self._name}")
            self._module_dict[n] = cls
        return cls

    def register_module(self, name=None, force=False, module=None):
        """Use as ``@REG.register_module()`` or ``REG.register_module(module=C)``."""
        if module is not None:
            return self._register(module, name=name, force=force)
        # support bare-decorator usage @REG.register_module
        if inspect.isclass(name) or inspect.isfunction(name):
            return self._register(name, name=None, force=force)

        def _decorator(cls):
            return self._register(cls, name=name, force=force)

        return _decorator


def build_from_cfg(cfg, registry, default_args=None):
    """Instantiate ``registry[cfg['type']](**cfg_without_type, **default_args)``."""
    if not isinstance(cfg, dict):
        raise TypeError(f"cfg must be a dict, got {type(cfg)}")
    if "type" not in cfg:
        raise KeyError(f"cfg must contain the key 'type': {cfg}")
    args = dict(cfg)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f"{obj_type} is not in the {registry.name} registry. "
                           f"Available: {sorted(registry.module_dict)}")
    elif inspect.isclass(obj_type) or inspect.isfunction(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"type must be a str or class, got {type(obj_type)}")
    if default_args is not None:
        for k, v in default_args.items():
            args.setdefault(k, v)
    return obj_cls(**args)
