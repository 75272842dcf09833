"""``python -m charlotte_spark CONFIG.json [test] [follow]`` — see cli.py."""

from .cli import main

raise SystemExit(main())
