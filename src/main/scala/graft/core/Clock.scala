package graft.core

import java.time.LocalDate

/** Injectable clock.
  *
  * The reference stamps SCD bookkeeping with `current_date()` /
  * `current_timestamp()` (`medallion/silver/b2s_yfinance.py:123,155,179`),
  * which makes runs irreproducible and same-day re-runs only accidentally
  * idempotent (SURVEY.md §7.4). All graft operators that need "now" take a
  * Clock so tests and the DuckDB oracle can pin it.
  */
trait Clock extends Serializable {
  def today: LocalDate
}

object Clock {
  case class Fixed(today: LocalDate) extends Clock
  case object Wall extends Clock { def today: LocalDate = LocalDate.now() }

  def fixed(iso: String): Clock = Fixed(LocalDate.parse(iso))
}
