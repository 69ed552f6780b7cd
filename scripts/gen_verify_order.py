#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/VerifyOrder.scala from BENCH_LAST.json
(the round discipline: Verify runs cheapest-first so a mid-loop kill
still yields the largest possible partial correctness board)."""
import json
import statistics

bench = json.load(open("BENCH_LAST.json"))
qs = {k: v for k, v in bench["queries"].items() if v >= 0}
median = round(statistics.median(qs.values()), 3)
lines = ",\n".join(
    f'    "{k}" -> {round(v, 3)}' for k, v in sorted(qs.items()))
body = f"""package graft
/** Static per-query cost table (seconds at sf0.1, from BENCH_LAST r13).
  * Verify runs queries cheapest-first so that a mid-loop kill of the
  * driver JVM still yields the largest possible partial correctness
  * board (round-11 post-mortem: an all-or-nothing write order turned
  * one incident into an empty board). Unknown (new) queries default
  * to the median cost so they still run mid-pack. */
object VerifyOrder {{
  val defaultCost: Double = {median}
  val cost: Map[String, Double] = Map(
{lines}
  )
}}
"""
open("src/main/scala/graft/VerifyOrder.scala", "w").write(body)
print(f"wrote {len(qs)} costs, median {median}")
