"""Pipeline plans: staging, geoprocessing, loading — the reference's
run.py stage graph compiled into DataFrame jobs."""
