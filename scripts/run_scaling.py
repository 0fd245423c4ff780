#!/usr/bin/env python
"""Run the bench scaling block standalone (writes one JSON line)."""
import sys, json, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import scaling_block
print("SCALING " + json.dumps(scaling_block(0.1)))
