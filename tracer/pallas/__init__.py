"""tracer.pallas"""
