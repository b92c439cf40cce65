"""Sphinx configuration for finmlkit-tpu."""
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "finmlkit-tpu"
author = "finmlkit-tpu contributors"
copyright = "2026, finmlkit-tpu contributors"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
autosummary_generate = True
autodoc_member_order = "bysource"
autodoc_mock_imports = []  # jax/flax are real dependencies

templates_path = ["_templates"]
exclude_patterns = []

html_theme = "furo"
html_static_path = ["_static"]
