"""Config system: YAML with recursive ``_BASE_CONFIG_`` inheritance + CLI overrides.

Capability parity with the reference config layer (``pcdet/config.py:16-85``):
- attribute-style nested dict (``EDict``),
- ``cfg_from_yaml_file`` with recursive ``_BASE_CONFIG_`` merge,
- dotted-path CLI overrides ``--set KEY.SUBKEY VALUE`` with type coercion,
- global ``cfg`` object and ``log_config_to_file``.
"""
from __future__ import annotations

import copy
from pathlib import Path

import yaml


class EDict(dict):
    """Attribute-accessible dict (recursive)."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        d = dict(d)
        d.update(kwargs)
        for k, v in d.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, EDict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = self._wrap(value)

    def __setitem__(self, key, value):
        super().__setitem__(key, self._wrap(value))

    def __deepcopy__(self, memo):
        return EDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self):
        def unwrap(v):
            if isinstance(v, EDict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return type(v)(unwrap(x) for x in v)
            return v

        return unwrap(self)


def merge_new_config(config: EDict, new_config: dict) -> EDict:
    """Recursively merge ``new_config`` into ``config``.

    A ``_BASE_CONFIG_`` key in ``new_config`` is loaded first (relative to the
    cfg file directory or cwd) so sibling keys override the base — mirrors the
    reference semantics (``pcdet/config.py:51-68``).
    """
    if '_BASE_CONFIG_' in new_config:
        base_path = Path(new_config['_BASE_CONFIG_'])
        if not base_path.exists():
            root = getattr(cfg, 'ROOT_DIR', Path('.'))
            for cand in (Path(root) / base_path, Path(root) / 'tools' / base_path):
                if cand.exists():
                    base_path = cand
                    break
        with open(base_path, 'r') as f:
            base = yaml.safe_load(f)
        config.update(EDict(base))

    for key, val in new_config.items():
        if key == '_BASE_CONFIG_':
            continue
        if isinstance(val, dict):
            # always recurse so nested _BASE_CONFIG_ entries resolve
            if not isinstance(config.get(key), dict):
                config[key] = EDict()
            merge_new_config(config[key], val)
        else:
            config[key] = val
    return config


def cfg_from_yaml_file(cfg_file, config: EDict | None = None) -> EDict:
    if config is None:
        config = cfg
    with open(cfg_file, 'r') as f:
        new_config = yaml.safe_load(f)
    merge_new_config(config, new_config)
    return config


def cfg_from_list(cfg_list, config: EDict | None = None) -> None:
    """Set config keys from a ``[key, value, key, value, ...]`` list.

    Values are parsed as YAML literals; dotted keys descend into sub-configs.
    Indexed list-element override (``KEY.0.SUB``) is supported like the
    reference (``pcdet/config.py:16-48``).
    """
    if config is None:
        config = cfg
    assert len(cfg_list) % 2 == 0, 'override list must be key/value pairs'
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = full_key.split('.')
        d = config
        for subkey in key_list[:-1]:
            if isinstance(d, (list, tuple)):
                d = d[int(subkey)]
            else:
                assert subkey in d, f'unknown config key: {full_key}'
                d = d[subkey]
        subkey = key_list[-1]
        try:
            value = yaml.safe_load(v) if isinstance(v, str) else v
        except yaml.YAMLError:
            value = v
        if isinstance(d, (list, tuple)):
            d[int(subkey)] = value
        else:
            if subkey in d and isinstance(d[subkey], dict) and isinstance(value, str):
                # partial dict override like KEY:{'a':1}
                value = yaml.safe_load(value)
                d[subkey].update(EDict(value))
            else:
                d[subkey] = value


def log_config_to_file(config: EDict, pre='cfg', logger=None):
    for key, val in config.items():
        if isinstance(val, EDict):
            if logger:
                logger.info('----------- %s -----------', key)
            log_config_to_file(val, pre=f'{pre}.{key}', logger=logger)
            continue
        if logger:
            logger.info('%s.%s: %s', pre, key, val)


class StaticConfig:
    """Immutable, hashable config wrapper for flax module attributes.

    linen converts plain dict attributes to ``FrozenDict`` (losing attribute
    access); wrapping keeps ``cfg.KEY`` / ``cfg.get`` working and makes the
    config hashable so modules stay comparable. Nested dicts are wrapped on
    access.
    """

    __slots__ = ('_d', '_key')

    def __init__(self, d):
        if isinstance(d, StaticConfig):
            d = d._d
        object.__setattr__(self, '_d', EDict(d))
        object.__setattr__(self, '_key', repr(sorted(self._d.to_dict().items(),
                                                     key=lambda kv: str(kv[0]))))

    @staticmethod
    def _wrap(v):
        if isinstance(v, dict):
            return StaticConfig(v)
        return v

    def __getattr__(self, name):
        try:
            return self._wrap(self._d[name])
        except KeyError as e:
            raise AttributeError(name) from e

    def __getitem__(self, name):
        return self._wrap(self._d[name])

    def get(self, name, default=None):
        v = self._d.get(name, default)
        return self._wrap(v)

    def __contains__(self, name):
        return name in self._d

    def keys(self):
        return self._d.keys()

    def items(self):
        return ((k, self._wrap(v)) for k, v in self._d.items())

    def __iter__(self):
        return iter(self._d)

    def __len__(self):
        return len(self._d)

    def __setattr__(self, name, value):
        raise AttributeError('StaticConfig is immutable')

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, StaticConfig) and self._key == other._key

    def __repr__(self):
        return f'StaticConfig({self._d!r})'

    def to_dict(self):
        return self._d.to_dict()


cfg = EDict()
cfg.ROOT_DIR = str(Path(__file__).resolve().parent.parent)
cfg.LOCAL_RANK = 0
