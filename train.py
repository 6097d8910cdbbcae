#!/usr/bin/env python
"""Repo-root entry point, flag-compatible with the reference's train.py."""

from mvlpt_tpu.cli.train import cli

if __name__ == "__main__":
    cli()
