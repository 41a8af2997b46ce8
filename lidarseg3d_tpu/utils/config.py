"""Python-module experiment configs with dot access.

Mirrors the reference's ``Config.fromfile`` behaviour
(/root/reference/det3d/torchie/utils/config.py:78-101): the config file is a
plain Python module; every non-dunder top-level name becomes a config key;
nested dicts get attribute access.
"""

import importlib.util
import os
import sys
import tempfile
import shutil


class ConfigDict(dict):
    """dict with attribute access, recursively applied."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, ConfigDict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, self._wrap(v))

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __deepcopy__(self, memo):
        import copy

        return ConfigDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def get(self, key, default=None):
        return super().get(key, default)

    def to_dict(self):
        def unwrap(v):
            if isinstance(v, ConfigDict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return type(v)(unwrap(x) for x in v)
            return v

        return unwrap(self)


class Config:
    def __init__(self, cfg_dict=None, filename=None, text=""):
        self._cfg_dict = ConfigDict(cfg_dict or {})
        self._filename = filename
        self._text = text

    @staticmethod
    def fromfile(filename):
        filename = os.path.abspath(os.path.expanduser(filename))
        if not os.path.isfile(filename):
            raise FileNotFoundError(filename)
        if not filename.endswith(".py"):
            raise ValueError("Only .py config files are supported")
        # import the config as a throwaway module (copied to a temp dir so the
        # config directory itself is importable for sibling-config imports)
        with tempfile.TemporaryDirectory() as tmpdir:
            tmp_path = os.path.join(tmpdir, "_tmp_cfg_module.py")
            shutil.copyfile(filename, tmp_path)
            cfg_dir = os.path.dirname(filename)
            sys.path.insert(0, cfg_dir)
            try:
                spec = importlib.util.spec_from_file_location("_tmp_cfg_module", tmp_path)
                mod = importlib.util.module_from_spec(spec)
                # let the config see its own source path (used for work_dir naming)
                mod.__file__ = filename
                spec.loader.exec_module(mod)
            finally:
                sys.path.pop(0)
            cfg_dict = {
                k: v for k, v in mod.__dict__.items() if not k.startswith("__")
            }
            sys.modules.pop("_tmp_cfg_module", None)
        with open(filename) as f:
            text = f.read()
        return Config(cfg_dict, filename=filename, text=text)

    @property
    def filename(self):
        return self._filename

    @property
    def text(self):
        return self._text

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._cfg_dict, name)

    def __getitem__(self, name):
        return self._cfg_dict[name]

    def __setattr__(self, name, value):
        if name.startswith("_"):
            super().__setattr__(name, value)
        else:
            self._cfg_dict[name] = value

    def __contains__(self, name):
        return name in self._cfg_dict

    def get(self, key, default=None):
        return self._cfg_dict.get(key, default)

    def keys(self):
        return self._cfg_dict.keys()

    def to_dict(self):
        return self._cfg_dict.to_dict()
