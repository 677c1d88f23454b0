"""tracer.materials"""
