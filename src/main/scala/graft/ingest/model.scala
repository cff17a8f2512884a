package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed API boundary (SURVEY §1.4): case-class views of the nested ticket
  * model for callers who want compile-time row types. Internally everything
  * stays DataFrame so Catalyst sees one declarative plan — `as[T]` only
  * installs the encoder at the edge; it adds no serialization until a typed
  * lambda actually runs. */
case class CommentRow(created_at: Timestamp, comment_id: Long, body: String)

case class TicketRow(
    ticket_id: Long,
    created_at: Timestamp,
    last_updated: Timestamp,
    status: String,
    status_ord: Option[Int],
    subject: String,
    tags: Seq[String],
    outcome: Option[String],
    ticket_type: Option[String],
    comments: Seq[CommentRow])

object TypedTickets {

  /** The bound nested ticket model as a typed Dataset. */
  def tickets(s: SparkSession): Dataset[TicketRow] = {
    import s.implicits._
    val t = Tickets.reshapeTickets(Tickets.scanTickets(s))
    Tickets.bindComments(s, t)
      .drop("description")
      .as[TicketRow]
  }

  /** Example typed consumer: open tickets with their latest comment —
    * filter/map stay on columns until the very last typed step. */
  def latestCommentOfOpen(s: SparkSession): Dataset[(Long, String)] = {
    import s.implicits._
    tickets(s)
      .filter(col("status") === "OPEN")
      .map(t => (t.ticket_id, t.comments.lastOption.map(_.body).getOrElse("")))
  }
}
