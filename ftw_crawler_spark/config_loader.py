"""Config-file loading — the reference's ``bin/crawl config.py`` surface.

The reference executes a user-supplied Python module and takes its
``CONFIG`` object (ftw/crawler/configuration.py:7-28 via
``imp.load_source``), then applies CLI overrides. Same contract here,
with ``importlib`` instead of the removed ``imp``: the module declares
``CONFIG = CrawlerConfig(sites=[Site(...)], fields=[Field(...)])``
using this package's classes — a reference user's config translates
Site-for-Site, Field-for-Field (extractor classes carry the same
names). The Tika/Solr URL options become the page-store/world and
index-output locations (those services are replaced by table scans and
the upsert sink — SURVEY §2 S6/S8).
"""

from __future__ import annotations

import importlib.util
import os
import sys

from ftw_crawler_spark.config import CrawlerConfig


def load_config_file(path: str) -> CrawlerConfig:
    """Execute the config module and return its ``CONFIG``.

    Reference parity notes: the module is executed (not parsed) exactly
    like ``imp.load_source`` did; a missing ``CONFIG`` attribute is an
    error; the object must be a CrawlerConfig.
    """
    path = os.path.abspath(path)
    module_name = os.path.splitext(os.path.basename(path))[0]
    spec = importlib.util.spec_from_file_location(module_name, path)
    if spec is None or spec.loader is None:
        raise ValueError(f"cannot load config module from {path}")
    module = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = module
    spec.loader.exec_module(module)
    if not hasattr(module, "CONFIG"):
        raise ValueError(f"{path} defines no CONFIG object")
    config = module.CONFIG
    if not isinstance(config, CrawlerConfig):
        raise ValueError(
            f"{path}: CONFIG must be a CrawlerConfig, got "
            f"{type(config).__name__}")
    return config
