package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;

/**
 * Class-level ScalaTest tag for suites too slow for the default
 * {@code sbt test} gate (r11 verdict item 2: the full suite ran ~36 min
 * and outlived the driver's verification window, so a green suite was
 * indistinguishable from a red one). The default run excludes this tag
 * (see build.sbt); {@code SPARK_GRAFT_FULL_TESTS=1 sbt test} runs
 * everything (the nightly / pre-release configuration). The heavyweight
 * gates carried by tagged suites (the sf0.001 shuffle-record budgets,
 * the full rank-tolerance sweeps, streaming end-to-end rounds) still
 * run on every full-tests invocation and before any budget re-record.
 */
@org.scalatest.TagAnnotation
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
public @interface SlowSuite {}
