# Sphinx configuration for the walnuts-tpu documentation site.
#
# Mirrors the reference's docs/conf.py role (Sphinx + API docs); the C++
# Doxygen half of the reference site has no analog here because the
# package is Python/JAX with only thin native bridges. Built in CI (the
# image this project is developed in has no network, so Sphinx runs
# there, not locally).

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "walnuts-tpu"
author = "walnuts-tpu developers"
release = "0.2.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
    "nbsphinx",
]

# jax and friends may be absent on the docs builder
autodoc_mock_imports = ["jax", "jaxlib", "numpy"]

exclude_patterns = ["_build"]
html_theme = "furo"
nbsphinx_execute = "never"
