"""Dataflow plans (SURVEY.md §2.7): the oracle scheduler, the Spark round
loop, and the round commit protocol."""
