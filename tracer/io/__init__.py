"""tracer.io"""
