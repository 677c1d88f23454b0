"""tracer.geometry"""
